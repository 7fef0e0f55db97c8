#!/usr/bin/env bash
# After the tail: SSND long run with stronger speaker-identification
# gradient (both knobs are reference flags), then re-infer.
set -uo pipefail
cd /root/repo
work=exp/hermetic_tsvad
run() { local name=$1; shift; echo "=== $name start $(date)"; "$@" > "logs/r4_$name.log" 2>&1 && echo "=== $name OK $(date)" || echo "=== $name FAIL $(date)"; }
cli="python -m speaker_diarization_tpu.cli"
if [ -d "$work/ssnd" ] && [ ! -d "$work/r4b_ssnd" ]; then mv "$work/ssnd" "$work/r4b_ssnd"; fi
run ssnd3_train $cli train --family ssnd --train-dir "$work/src" \
  --exp-dir "$work/ssnd" --resume \
  --set sample_rate=8000 --set rs_len=4.0 \
  --set encoder_blocks=4,8,4 --set ssnd_arcface_weight=0.1 \
  --set batch_size=16 --set num_steps=16000 \
  --set optimizer=adam --set schedule=poly --set learning_rate=2e-4 \
  --set warmup_steps=400 --set bf16=true \
  --set log_every=50 --set valid_every=100000
run ssnd3_infer $cli infer --family ssnd --data-dir "$work/test/data" \
  --exp-dir "$work/ssnd" --out "$work/hyp_ssnd.rttm" \
  --threshold-sweep --ref "$work/test/data/rttm" \
  --set sample_rate=8000 --set rs_len=4.0 --set encoder_blocks=4,8,4
run ssnd3_rescore $cli infer --family ssnd --data-dir "$work/test/data" \
  --exp-dir "$work/ssnd" --out "$work/hyp_ssnd_rescore.rttm" --ssnd-rescore \
  --threshold-sweep --ref "$work/test/data/rttm" \
  --set sample_rate=8000 --set rs_len=4.0 --set encoder_blocks=4,8,4
echo "=== post done $(date)"
