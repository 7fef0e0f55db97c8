#!/usr/bin/env bash
# TS-VAD on AliMeeting-format data — the TPU-native analogue of the
# reference's egs/alimeeting/run_ts_vad2.sh. Requires the AliMeeting corpus
# (TextGrid + wavs) and a pretrained CAM++ torch checkpoint on disk.
# Stages mirror the reference: prep → target-speaker embeddings → train →
# chunked voted inference → DER (incl. overlap-only, the spyder numbers).
set -euo pipefail

stage=0
stop_stage=100
alimeeting=${ALIMEETING:-/data/AliMeeting}   # Train_Ali_far / Eval_Ali_far
campplus_ckpt=${CAMPPLUS_CKPT:-campplus_cn_common.bin}
work=${WORK:-/tmp/tsvad_recipe}
rs_len=${RS_LEN:-4}
num_steps=${NUM_STEPS:-60000}

. "$(dirname "$0")/parse_options.sh"

CLI="python -m speaker_diarization_tpu.cli"

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  echo "stage 0: TextGrid -> RTTM + per-speaker target audio + 25 Hz labels"
  for split in train:Train_Ali_far eval:Eval_Ali_far; do
    name=${split%%:*}; sub=${split##*:}
    python - "$alimeeting/$sub/textgrid_dir" "$alimeeting/$sub/audio_dir" "$work/$name" <<'PY'
import sys
from speaker_diarization_tpu.data.textgrid import prepare_alimeeting_dir
prepare_alimeeting_dir(sys.argv[1], sys.argv[2], sys.argv[3])
PY
  done
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  echo "stage 1: extract target-speaker embeddings (6 s windows / 1 s hop)"
  for split in train eval; do
    $CLI extract-embeddings --data-dir "$work/$split/targets" \
      --out "$work/$split/embs.npz" --encoder-ckpt "$campplus_ckpt"
  done
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  echo "stage 2: train TS-VAD (CAM++ encoder, bf16, Polyak averaging)"
  $CLI train --family tsvad \
    --train-dir "$work/train" --valid-dir "$work/eval" \
    --emb-store "$work/train/embs.npz" --encoder-ckpt "$campplus_ckpt" \
    --exp-dir "$work/exp" \
    --set rs_len="$rs_len" --set num_steps="$num_steps" --set batch_size=64 \
    --set bf16=true --set model_avg_decay=0.999
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  echo "stage 3: overlapped-window voted inference + threshold sweep"
  $CLI infer --family tsvad \
    --data-dir "$work/eval" --emb-store "$work/eval/embs.npz" \
    --exp-dir "$work/exp" --out "$work/hyp.rttm" \
    --set rs_len="$rs_len" --infer-shift 1.0 \
    --threshold-sweep --ref "$work/eval/rttm"
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  echo "stage 4: DER (collar 0.25 / 0.0) + overlap-only DER"
  $CLI score --ref "$work/eval/rttm" --sys "$work/hyp.rttm" -c 0.25
  $CLI score --ref "$work/eval/rttm" --sys "$work/hyp.rttm" -c 0.0
  $CLI score --ref "$work/eval/rttm" --sys "$work/hyp.rttm" -c 0.25 --regions overlap
fi
