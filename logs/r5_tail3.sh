#!/usr/bin/env bash
# Round-5 tail v3: EEND re-base with chunk_frames=300 (the 500-frame chunk
# exceeded most simulated meetings' 426 subsampled frames, silently
# dropping ~80% of the corpus — the round-4 overfit root cause), then the
# remaining rows + perf capture.
set -uo pipefail
cd /root/repo
work=exp/hermetic_tsvad
cli="python -m speaker_diarization_tpu.cli"
run() { local name=$1 tmo=$2; shift 2; echo "=== $name start $(date)"; timeout "$tmo" "$@" > "logs/r5_$name.log" 2>&1 && echo "=== $name OK $(date)" || echo "=== $name FAIL($?) $(date)"; }

run eend3c 2700 $cli train --family eend --train-dir "$work/train_big/data" \
  --valid-dir "$work/valid/data" --exp-dir "$work/eend3c" --resume \
  --set sample_rate=8000 --set n_speakers=3 --set n_mels=23 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=300 --set batch_size=32 --set num_steps=3500 \
  --set optimizer=adam --set schedule=noam --set learning_rate=1.0 \
  --set warmup_steps=1000 --set bf16=true \
  --set log_every=50 --set valid_every=500
run eend3c_infer 1500 $cli infer --family eend --data-dir "$work/test/data" \
  --exp-dir "$work/eend3c" --out "$work/hyp_eend3.rttm" \
  --threshold-sweep --ref "$work/test/data/rttm" \
  --set sample_rate=8000 --set n_speakers=3 --set n_mels=23 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=300

run ecapa 3000 env STEPS=2500 bash recipes/hermetic_leaderboard.sh ecapa
run enhancer_eval 3000 bash recipes/hermetic_leaderboard.sh enhancer_eval
run vbx 1500 bash recipes/hermetic_leaderboard.sh vbx

run profile_parts 1500 python scripts/tsvad_profile_parts.py
run bench_final 2400 python bench.py
run microbench 2400 python scripts/microbench.py
echo "=== r5 tail3 done $(date)"
