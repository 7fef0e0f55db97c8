#!/usr/bin/env bash
# Round-5 corpus rebuild (filesystem was reset to git state; exp/ was wiped).
# Stage 1 of hermetic_tsvad_full_stack.sh + the train_big split for the
# EEND 3-spk re-base (1200 mixtures from the same source pool).
set -euo pipefail
cd /root/repo
work=exp/hermetic_tsvad
bash recipes/hermetic_tsvad_full_stack.sh 1 1
python - "$work" <<'EOF'
import sys, os
work = sys.argv[1]
from speaker_diarization_tpu.data.simulate import random_mixture_specs, make_mixtures
out = os.path.join(work, "train_big")
if os.path.exists(os.path.join(out, "data", "rttm")):
    print("skip train_big")
else:
    src = os.path.join(work, "src")
    noise = os.path.join(work, "noise")
    specs = random_mixture_specs(src, noise, None, n_mixtures=1200, n_speakers=3,
                                 min_utts=6, max_utts=12, sil_scale=1.5,
                                 noise_snrs=(10.0, 20.0), speech_rvb_probability=0.0, seed=40)
    make_mixtures(specs, os.path.join(out, "data"), os.path.join(out, "wav"), 8000)
    print("made train_big")
EOF
echo corpus done
