#!/usr/bin/env bash
# EEND / EEND-EDA on a simulated 2-speaker corpus — the TPU-native analogue
# of the reference's egs/mini_librispeech pipeline
# (010_prepare_mini_librispeech_kaldi_format_hltsz.sh + eend_eda train/infer).
# Kaldi-style numbered stages: run with  --stage N --stop-stage M.
set -euo pipefail

stage=0
stop_stage=100
work=${WORK:-/tmp/eend_recipe}
family=${FAMILY:-eend}          # eend | eend_eda
n_mixtures=${N_MIXTURES:-1200}
num_steps=${NUM_STEPS:-2500}
chunk_frames=${CHUNK_FRAMES:-300}

. "$(dirname "$0")/parse_options.sh"

CLI="python -m speaker_diarization_tpu.cli"

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  echo "stage 0: simulate train corpus (hermetic synthetic voices + noise)"
  $CLI simulate --out "$work/train" --n-mixtures "$n_mixtures" --n-speakers 2
  $CLI simulate --out "$work/dev" --n-mixtures 16 --n-speakers 2 --seed 31337
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  echo "stage 1: train $family"
  $CLI train --family "$family" \
    --train-dir "$work/train/data" --valid-dir "$work/dev/data" \
    --exp-dir "$work/exp_$family" \
    --set num_steps="$num_steps" --set batch_size=32 --set bf16=true \
    --set chunk_frames="$chunk_frames" --set warmup_steps=800
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  echo "stage 2: chunked inference (threshold sweep)"
  $CLI infer --family "$family" \
    --data-dir "$work/dev/data" --exp-dir "$work/exp_$family" \
    --out "$work/hyp.rttm" --set chunk_frames="$chunk_frames" --set bf16=true \
    --threshold-sweep --ref "$work/dev/data/rttm"
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  echo "stage 3: score (md-eval semantics, collar 0.25 and 0.0 + CDER)"
  $CLI score --ref "$work/dev/data/rttm" --sys "$work/hyp.rttm" -c 0.25 --cder
  $CLI score --ref "$work/dev/data/rttm" --sys "$work/hyp.rttm" -c 0.0
fi
