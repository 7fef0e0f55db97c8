#!/usr/bin/env bash
# Clustering baseline — the TPU-native analogue of the reference's
# egs/alimeeting/run_spectral_cluster.sh: system SAD (neural VAD or energy)
# -> 1.5 s/0.75 s subsegment CAM++ embeddings -> spectral clustering -> DER.
set -euo pipefail

stage=0
stop_stage=100
data=${DATA:-/data/eval}            # kaldi dir with wav.scp (+ rttm for scoring)
campplus_ckpt=${CAMPPLUS_CKPT:-campplus_cn_common.bin}
sad=${SAD:-energy}                  # energy | oracle | neural
vad_ckpt=${VAD_CKPT:-}
work=${WORK:-/tmp/cluster_recipe}
method=${METHOD:-spectral}          # spectral | umap

. "$(dirname "$0")/parse_options.sh"

CLI="python -m speaker_diarization_tpu.cli"
mkdir -p "$work"

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  echo "stage 0: SAD -> embeddings -> $method clustering -> RTTM"
  extra=()
  [ "$sad" = neural ] && extra+=(--vad-ckpt "$vad_ckpt")
  [ -f "$data/rttm" ] && extra+=(--ref "$data/rttm")
  $CLI cluster --data-dir "$data" --out "$work/hyp.rttm" \
    --method "$method" --sad "$sad" \
    --encoder campplus --encoder-ckpt "$campplus_ckpt" "${extra[@]}"
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ] && [ -f "$data/rttm" ]; then
  echo "stage 1: DER breakdown"
  $CLI score --ref "$data/rttm" --sys "$work/hyp.rttm" -c 0.25
  $CLI score --ref "$data/rttm" --sys "$work/hyp.rttm" -c 0.0 --per-file
fi
