#!/bin/bash
# CPU preflight phase 3: streaming TS-VAD, EEND-EDA, mamba2 TS-VAD
# (the stream_eda recipe paths that run after the leaderboard).
set -x
cd /root/repo
export SDT_PLATFORM=cpu PYTHONUNBUFFERED=1
work=exp/hermetic_tsvad
rate=8000
cli="python -m speaker_diarization_tpu.cli"
pf=/tmp/preflight

run() { timeout 1200 nice -n 15 "$@"; }

stream_cfg=(--set sample_rate=$rate --set n_mels=80 --set rs_len=4.0
  --set d_model=256 --set d_ff=1024 --set n_layers=2 --set n_heads=4
  --set streaming_chunk_size=16 --set streaming_left_chunks=4)
run $cli train --family tsvad_streaming --train-dir "$work/train/data" \
  --exp-dir "$pf/stream" \
  --emb-store "$work/train/embs.npz,$work/valid/embs.npz" \
  --noise-dir "$work/noise" \
  "${stream_cfg[@]}" \
  --set segment_shift=2.0 --set batch_size=2 --set num_steps=3 \
  --set optimizer=adam --set schedule=poly --set learning_rate=2e-4 \
  --set warmup_steps=400 --set bf16=false --set log_every=1 --set valid_every=100000 \
  && run $cli infer --family tsvad_streaming --data-dir "$pf/test/data" \
  --exp-dir "$pf/stream" --emb-store "$work/test/embs.npz" \
  --out "$pf/hyp_stream.rttm" \
  --threshold-sweep --ref "$pf/test/data/rttm" \
  "${stream_cfg[@]}" \
  && echo "PREFLIGHT stream OK" || echo "PREFLIGHT stream FAILED"

eda_cfg=(--set sample_rate=$rate --set n_mels=23 --set d_model=192
  --set d_ff=768 --set n_layers=3 --set n_heads=4 --set n_speakers=3
  --set chunk_frames=300 --set subsampling=10)
run $cli train --family eend_eda --train-dir "$work/train/data" \
  --exp-dir "$pf/eda" \
  "${eda_cfg[@]}" \
  --set batch_size=2 --set num_steps=3 \
  --set optimizer=adam --set schedule=noam --set warmup_steps=1000 \
  --set learning_rate=1.0 --set bf16=false --set log_every=1 --set valid_every=100000 \
  && run $cli infer --family eend_eda --data-dir "$pf/test/data" \
  --exp-dir "$pf/eda" --out "$pf/hyp_eda.rttm" \
  --threshold-sweep --ref "$pf/test/data/rttm" \
  "${eda_cfg[@]}" \
  && echo "PREFLIGHT eda OK" || echo "PREFLIGHT eda FAILED"

mamba_cfg=(--set sample_rate=$rate --set n_mels=80 --set encoder_blocks=12,24,16
  --set rs_len=4.0 --set single_backend_type=mamba2 --set multi_backend_type=mamba2
  --set d_state=64 --set expand=2)
run $cli train --family tsvad --train-dir "$work/train/data" \
  --exp-dir "$pf/tsvad_mamba2" --emb-store "$work/train/embs.npz,$work/valid/embs.npz" \
  --encoder-ckpt "$work/encoder.npz" --noise-dir "$work/noise" \
  "${mamba_cfg[@]}" \
  --set segment_shift=2.0 --set batch_size=2 --set num_steps=3 \
  --set optimizer=adam --set schedule=poly --set learning_rate=2e-4 \
  --set warmup_steps=400 --set bf16=false --set log_every=1 --set valid_every=100000 \
  && run $cli infer --family tsvad --data-dir "$pf/test/data" --exp-dir "$pf/tsvad_mamba2" \
  --emb-store "$work/test/embs.npz" --out "$pf/hyp_mamba2.rttm" \
  --threshold-sweep --ref "$pf/test/data/rttm" \
  "${mamba_cfg[@]}" \
  && echo "PREFLIGHT mamba2 OK" || echo "PREFLIGHT mamba2 FAILED"

echo PREFLIGHT_PHASE3_DONE
