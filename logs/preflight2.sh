#!/bin/bash
# CPU preflight phase 2: families needing stage-3 artifacts (embs/targets).
set -x
cd /root/repo
export SDT_PLATFORM=cpu PYTHONUNBUFFERED=1
work=exp/hermetic_tsvad
rate=8000
cli="python -m speaker_diarization_tpu.cli"
pf=/tmp/preflight
while [ ! -f "$work/test/embs.npz" ]; do sleep 15; done

run() { timeout 900 nice -n 15 "$@"; }

# sond
run $cli train --family sond --train-dir "$work/train/data" \
  --exp-dir "$pf/sond" \
  --emb-store "$work/train/embs.npz,$work/valid/embs.npz" \
  --set sample_rate=$rate --set n_mels=80 --set n_speakers=4 \
  --set rs_len=4.0 --set segment_shift=2.0 --set d_model=256 \
  --set encoder_blocks=2,2,2,2 \
  --set batch_size=2 --set num_steps=3 \
  --set optimizer=adam --set schedule=poly --set learning_rate=2e-4 \
  --set warmup_steps=400 --set bf16=false --set log_every=1 --set valid_every=100000 \
  && run $cli infer --family sond --data-dir "$pf/test/data" \
  --exp-dir "$pf/sond" --emb-store "$work/test/embs.npz" \
  --out "$pf/hyp_sond.rttm" \
  --threshold-sweep --ref "$pf/test/data/rttm" \
  --set sample_rate=$rate --set n_mels=80 --set n_speakers=4 \
  --set rs_len=4.0 --set d_model=256 --set encoder_blocks=2,2,2,2 \
  && echo "PREFLIGHT sond OK" || echo "PREFLIGHT sond FAILED"

# tsvad3
run $cli train --family tsvad3 --train-dir "$work/train/data" \
  --exp-dir "$pf/tsvad3" \
  --target-audio-dir "$work/train/targets/target_audio" \
  --valid-target-audio-dir "$work/valid/targets/target_audio" \
  --encoder-ckpt "$work/encoder.npz" --noise-dir "$work/noise" \
  --set sample_rate=$rate --set n_mels=80 --set encoder_blocks=12,24,16 \
  --set rs_len=4.0 --set ts_len=3.0 --set segment_shift=2.0 \
  --set batch_size=2 --set num_steps=3 \
  --set optimizer=adam --set schedule=poly --set learning_rate=2e-4 \
  --set warmup_steps=400 --set bf16=false --set log_every=1 --set valid_every=100000 \
  && run $cli infer --family tsvad3 --data-dir "$pf/test/data" \
  --exp-dir "$pf/tsvad3" \
  --target-audio-dir "$work/test/targets/target_audio" \
  --out "$pf/hyp_tsvad3.rttm" \
  --threshold-sweep --ref "$pf/test/data/rttm" \
  --set sample_rate=$rate --set n_mels=80 --set encoder_blocks=12,24,16 \
  --set rs_len=4.0 --set ts_len=3.0 \
  && echo "PREFLIGHT tsvad3 OK" || echo "PREFLIGHT tsvad3 FAILED"

# tsvad_rev (RIR synth + tsvad with rir-dir)
python - <<'PYEOF'
import os, sys
sys.path.insert(0, "/root/repo")
from speaker_diarization_tpu.data.simulate import synthesize_rir_corpus
d = "exp/hermetic_tsvad/rir_image"
if not os.path.exists(os.path.join(d, "wav.scp")):
    synthesize_rir_corpus(d, n_rirs=8, rate=8000, seed=7, method="image_source")
    print("made image-source RIRs:", d)
PYEOF
run $cli train --family tsvad --train-dir "$work/train/data" \
  --exp-dir "$pf/tsvad_rev" --emb-store "$work/train/embs.npz,$work/valid/embs.npz" \
  --encoder-ckpt "$work/encoder.npz" --noise-dir "$work/noise" \
  --rir-dir "$work/rir_image" \
  --set sample_rate=$rate --set n_mels=80 --set encoder_blocks=12,24,16 \
  --set rs_len=4.0 --set segment_shift=2.0 --set batch_size=2 \
  --set num_steps=3 --set optimizer=adam --set schedule=poly \
  --set learning_rate=2e-4 --set warmup_steps=400 --set bf16=false \
  --set log_every=1 --set valid_every=100000 \
  && run $cli infer --family tsvad --data-dir "$pf/test/data" --exp-dir "$pf/tsvad_rev" \
  --emb-store "$work/test/embs.npz" --out "$pf/hyp_tsvad_rev.rttm" \
  --threshold-sweep --ref "$pf/test/data/rttm" \
  --set sample_rate=$rate --set n_mels=80 --set encoder_blocks=12,24,16 \
  --set rs_len=4.0 \
  && echo "PREFLIGHT tsvad_rev OK" || echo "PREFLIGHT tsvad_rev FAILED"

echo PREFLIGHT_PHASE2_DONE
