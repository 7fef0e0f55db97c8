#!/usr/bin/env bash
set -uo pipefail
cd /root/repo
work=exp/hermetic_tsvad
python -m speaker_diarization_tpu.cli train --family ssnd --train-dir "$work/src" \
  --real-data-dir "$work/train/data" \
  --exp-dir "$work/ssnd_r5" \
  --set sample_rate=8000 --set rs_len=4.0 --set encoder_blocks=4,8,4 \
  --set batch_size=16 --set num_steps=8000 \
  --set optimizer=adam --set schedule=poly --set learning_rate=2e-4 \
  --set warmup_steps=400 --set bf16=true \
  --set ssnd_arcface_weight=0.05 \
  --set log_every=50 --set valid_every=100000
