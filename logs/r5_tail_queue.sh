#!/usr/bin/env bash
# Round-5 reprioritized tail: wait for the running SSND recipe (PID arg),
# then run the VERDICT missing rows in priority order. Logs match the
# names the main queue would have produced.
set -uo pipefail
cd /root/repo
work=exp/hermetic_tsvad
cli="python -m speaker_diarization_tpu.cli"
ssnd_pid=${1:?}
while kill -0 "$ssnd_pid" 2>/dev/null; do sleep 20; done
echo "=== ssnd recipe finished $(date)"
run() { local name=$1 tmo=$2; shift 2; echo "=== $name start $(date)"; timeout "$tmo" "$@" > "logs/r5_$name.log" 2>&1 && echo "=== $name OK $(date)" || echo "=== $name FAIL($?) $(date)"; }

# EEND 3-spk re-base (VERDICT missing #3) on the 1200-mixture corpus
run eend3b 2700 $cli train --family eend --train-dir "$work/train_big/data" \
  --valid-dir "$work/valid/data" --exp-dir "$work/eend3b" --resume \
  --set sample_rate=8000 --set n_speakers=3 --set n_mels=23 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=500 --set batch_size=32 --set num_steps=4500 \
  --set optimizer=adam --set schedule=noam --set learning_rate=1.0 \
  --set warmup_steps=1000 --set bf16=true \
  --set log_every=50 --set valid_every=500
run eend3b_infer 1500 $cli infer --family eend --data-dir "$work/test/data" \
  --exp-dir "$work/eend3b" --out "$work/hyp_eend3.rttm" \
  --threshold-sweep --ref "$work/test/data/rttm" \
  --set sample_rate=8000 --set n_speakers=3 --set n_mels=23 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=500

# ecapa encoder row (VERDICT missing #4)
run ecapa 3600 env STEPS=2500 bash recipes/hermetic_leaderboard.sh ecapa

# enhancer DER effect (VERDICT missing #5)
run enhancer_eval 3600 bash recipes/hermetic_leaderboard.sh enhancer_eval

# VBx baseline (fast)
run vbx 1800 bash recipes/hermetic_leaderboard.sh vbx

# perf record with the adaptive-tile fbank kernel
run profile_parts 1800 python scripts/tsvad_profile_parts.py
run bench_final 2400 python bench.py
run microbench 2400 python scripts/microbench.py

echo "=== r5 tail queue done $(date)"
