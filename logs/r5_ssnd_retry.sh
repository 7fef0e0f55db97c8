#!/usr/bin/env bash
# SSND retrain with wedge watchdog: the axon relay occasionally wedges
# (all threads futex-wait, no log output). If the train log goes stale
# for >180 s, kill the exact PID and relaunch with --resume (periodic
# checkpoints every 2000 steps via valid_every=save_every default).
set -uo pipefail
cd /root/repo
work=exp/hermetic_tsvad
cli="python -m speaker_diarization_tpu.cli"
log=logs/r5_ssnd2.log
attempt=0
while [ $attempt -lt 6 ]; do
  attempt=$((attempt + 1))
  echo "=== ssnd train attempt $attempt $(date)"
  $cli train --family ssnd --train-dir "$work/src" \
    --real-data-dir "$work/train/data" \
    --exp-dir "$work/ssnd_r5" --resume \
    --set sample_rate=8000 --set rs_len=4.0 --set encoder_blocks=4,8,4 \
    --set batch_size=16 --set num_steps=8000 \
    --set optimizer=adam --set schedule=poly --set learning_rate=2e-4 \
    --set warmup_steps=400 --set bf16=true --set ssnd_arcface_weight=0.05 \
    --set log_every=50 --set valid_every=2000 >> "$log" 2>&1 &
  pid=$!
  while kill -0 $pid 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$log") ))
    if [ "$age" -gt 180 ]; then
      echo "=== wedge detected (log stale ${age}s), killing $pid $(date)"
      kill $pid 2>/dev/null; sleep 5; kill -9 $pid 2>/dev/null
      break
    fi
  done
  wait $pid 2>/dev/null
  rc=$?
  if grep -q "training done at step 8000" "$log"; then
    echo "=== ssnd train complete $(date)"; break
  fi
  echo "=== attempt $attempt ended rc=$rc, resuming $(date)"
done
echo "=== ssnd infer $(date)"
timeout 1800 $cli infer --family ssnd --data-dir "$work/test/data" \
  --exp-dir "$work/ssnd_r5" --out "$work/hyp_ssnd.rttm" \
  --threshold-sweep --ssnd-rescore --ref "$work/test/data/rttm" \
  --set sample_rate=8000 --set rs_len=4.0 --set encoder_blocks=4,8,4 \
  > logs/r5_ssnd_infer.log 2>&1 && echo "=== ssnd infer OK $(date)" || echo "=== ssnd infer FAIL $(date)"
