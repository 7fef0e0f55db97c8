#!/usr/bin/env bash
# Hermetic DER leaderboard: train EVERY remaining model family on the shared
# simulated corpus from hermetic_tsvad_full_stack.sh (run its stages 1-3
# first) and score held-out DER through the standard postproc path.
#
#   family list (one training+inference stage each):
#     m2f      EEND-M2F set prediction (true ×10 backbone)
#     fs_eend  frame-streaming online EEND
#     eend_vc  chunked EEND + speaker-vector clustering
#     sond     powerset SOND (ConvEncoder profiles + SANM CD scorer)
#     ssnd     seq2seq neural diarization (simu mixer training)
#     ots_vad  enrollment-free online TS-VAD
#     tsvad3   TS-VAD with online enrollment-waveform embeddings
#
# Usage: WORK=exp/hermetic_tsvad bash recipes/hermetic_leaderboard.sh [families...]
# The reference proves each family with golden DERs in its run_*.sh
# comments (e.g. run_ts_vad2.sh:191-246); this is that culture applied
# uniformly and hermetically.
set -euo pipefail

work=${WORK:-exp/hermetic_tsvad}
rate=8000
cli="python -m speaker_diarization_tpu.cli"
steps=${STEPS:-4000}
steps5=${STEPS5:-5000}
families=${@:-m2f fs_eend eend_vc sond ssnd ots_vad tsvad3 tsvad_rev}

run_family() {
  local fam=$1
  case "$fam" in
  m2f)
    $cli train --family eend_m2f --train-dir "$work/train/data" \
      --valid-dir "$work/valid/data" --exp-dir "$work/m2f" --resume \
      --set sample_rate=$rate --set n_speakers=3 \
      --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
      --set chunk_frames=500 --set batch_size=16 --set num_steps=$steps \
      --set optimizer=adam --set schedule=poly --set learning_rate=2e-4 \
      --set warmup_steps=400 --set bf16=true \
      --set log_every=20 --set valid_every=500
    $cli infer --family eend_m2f --data-dir "$work/test/data" \
      --exp-dir "$work/m2f" --out "$work/hyp_m2f.rttm" \
      --threshold-sweep --ref "$work/test/data/rttm" \
      --set sample_rate=$rate --set n_speakers=3 \
      --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
      --set chunk_frames=500
    ;;
  fs_eend)
    $cli train --family fs_eend --train-dir "$work/train/data" \
      --valid-dir "$work/valid/data" --exp-dir "$work/fs_eend" --resume \
      --set sample_rate=$rate --set n_speakers=3 --set n_mels=23 \
      --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
      --set chunk_frames=500 --set batch_size=16 --set num_steps=$steps5 \
      --set optimizer=adam --set schedule=noam --set learning_rate=1.0 \
      --set warmup_steps=1000 --set bf16=true \
      --set log_every=20 --set valid_every=500
    $cli infer --family fs_eend --data-dir "$work/test/data" \
      --exp-dir "$work/fs_eend" --out "$work/hyp_fs_eend.rttm" \
      --threshold-sweep --ref "$work/test/data/rttm" \
      --set sample_rate=$rate --set n_speakers=3 --set n_mels=23 \
      --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
      --set chunk_frames=500
    ;;
  eend_vc)
    $cli train --family eend_vc --train-dir "$work/train/data" \
      --valid-dir "$work/valid/data" --exp-dir "$work/eend_vc" --resume \
      --set sample_rate=$rate --set n_speakers=3 --set n_mels=23 \
      --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
      --set chunk_frames=200 --set batch_size=32 --set num_steps=$steps5 \
      --set optimizer=adam --set schedule=noam --set learning_rate=1.0 \
      --set warmup_steps=1000 --set bf16=true \
      --set log_every=20 --set valid_every=500
    $cli infer --family eend_vc --data-dir "$work/test/data" \
      --exp-dir "$work/eend_vc" --out "$work/hyp_eend_vc.rttm" \
      --threshold-sweep --ref "$work/test/data/rttm" \
      --set sample_rate=$rate --set n_speakers=3 --set n_mels=23 \
      --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
      --set chunk_frames=200
    ;;
  sond)
    $cli train --family sond --train-dir "$work/train/data" \
      --valid-dir "$work/valid/data" --exp-dir "$work/sond" --resume \
      --emb-store "$work/train/embs.npz,$work/valid/embs.npz" \
      --set sample_rate=$rate --set n_mels=80 --set n_speakers=4 \
      --set rs_len=4.0 --set segment_shift=2.0 --set d_model=256 \
      --set encoder_blocks=2,2,2,2 \
      --set batch_size=16 --set num_steps=$steps \
      --set optimizer=adam --set schedule=poly --set learning_rate=2e-4 \
      --set warmup_steps=400 --set bf16=true \
      --set log_every=20 --set valid_every=500
    $cli infer --family sond --data-dir "$work/test/data" \
      --exp-dir "$work/sond" --emb-store "$work/test/embs.npz" \
      --out "$work/hyp_sond.rttm" \
      --threshold-sweep --ref "$work/test/data/rttm" \
      --set sample_rate=$rate --set n_mels=80 --set n_speakers=4 \
      --set rs_len=4.0 --set d_model=256 --set encoder_blocks=2,2,2,2
    ;;
  ssnd)
    $cli train --family ssnd --train-dir "$work/src" \
      --exp-dir "$work/ssnd" --resume \
      --set sample_rate=$rate --set rs_len=4.0 \
      --set encoder_blocks=4,8,4 \
      --set batch_size=16 --set num_steps=$steps \
      --set optimizer=adam --set schedule=poly --set learning_rate=2e-4 \
      --set warmup_steps=400 --set bf16=true \
      --set log_every=20 --set valid_every=100000
    $cli infer --family ssnd --data-dir "$work/test/data" \
      --exp-dir "$work/ssnd" --out "$work/hyp_ssnd.rttm" \
      --threshold-sweep --ref "$work/test/data/rttm" \
      --set sample_rate=$rate --set rs_len=4.0 --set encoder_blocks=4,8,4
    ;;
  ots_vad)
    $cli train --family ots_vad --train-dir "$work/train/data" \
      --valid-dir "$work/valid/data" --exp-dir "$work/ots_vad" --resume \
      --noise-dir "$work/noise" \
      --set sample_rate=$rate --set n_mels=80 --set n_speakers=4 \
      --set rs_len=4.0 --set segment_shift=2.0 \
      --set encoder_blocks=2,2,2,2 --set d_model=192 --set n_layers=4 \
      --set n_heads=4 --set d_ff=512 \
      --set batch_size=16 --set num_steps=$steps \
      --set optimizer=adam --set schedule=poly --set learning_rate=2e-4 \
      --set warmup_steps=400 --set bf16=true \
      --set log_every=20 --set valid_every=500
    $cli infer --family ots_vad --data-dir "$work/test/data" \
      --exp-dir "$work/ots_vad" --out "$work/hyp_ots_vad.rttm" \
      --threshold-sweep --ref "$work/test/data/rttm" \
      --set sample_rate=$rate --set n_mels=80 --set n_speakers=4 \
      --set rs_len=4.0 --set encoder_blocks=2,2,2,2 --set d_model=192 \
      --set n_layers=4 --set n_heads=4 --set d_ff=512
    ;;
  tsvad3)
    $cli train --family tsvad3 --train-dir "$work/train/data" \
      --valid-dir "$work/valid/data" --exp-dir "$work/tsvad3" --resume \
      --target-audio-dir "$work/train/targets/target_audio" \
      --valid-target-audio-dir "$work/valid/targets/target_audio" \
      --encoder-ckpt "$work/encoder.npz" --noise-dir "$work/noise" \
      --set sample_rate=$rate --set n_mels=80 --set encoder_blocks=12,24,16 \
      --set rs_len=4.0 --set ts_len=3.0 --set segment_shift=2.0 \
      --set batch_size=16 --set num_steps=$steps \
      --set optimizer=adam --set schedule=poly --set learning_rate=2e-4 \
      --set warmup_steps=400 --set bf16=true \
      --set log_every=20 --set valid_every=500
    $cli infer --family tsvad3 --data-dir "$work/test/data" \
      --exp-dir "$work/tsvad3" \
      --target-audio-dir "$work/test/targets/target_audio" \
      --out "$work/hyp_tsvad3.rttm" \
      --threshold-sweep --ref "$work/test/data/rttm" \
      --set sample_rate=$rate --set n_mels=80 --set encoder_blocks=12,24,16 \
      --set rs_len=4.0 --set ts_len=3.0
    ;;
  tsvad_rev)
    # reverb-aug variant: train-time convolution with image-source
    # shoebox-room RIRs (data/room.py, genrir.py semantics)
    python - <<'PYEOF'
import os
from speaker_diarization_tpu.data.simulate import synthesize_rir_corpus
work = os.environ.get("WORK", "exp/hermetic_tsvad")
d = os.path.join(work, "rir_image")
if not os.path.exists(os.path.join(d, "wav.scp")):
    synthesize_rir_corpus(d, n_rirs=8, rate=8000, seed=7, method="image_source")
    print("made image-source RIRs:", d)
PYEOF
    $cli train --family tsvad --train-dir "$work/train/data" --valid-dir "$work/valid/data" \
      --exp-dir "$work/tsvad_rev" --emb-store "$work/train/embs.npz,$work/valid/embs.npz" \
      --encoder-ckpt "$work/encoder.npz" --noise-dir "$work/noise" \
      --rir-dir "$work/rir_image" --resume \
      --set sample_rate=$rate --set n_mels=80 --set encoder_blocks=12,24,16 \
      --set rs_len=4.0 --set segment_shift=2.0 --set batch_size=64 \
      --set num_steps=$steps --set optimizer=adam --set schedule=poly \
      --set learning_rate=2e-4 --set warmup_steps=400 --set bf16=true \
      --set log_every=20 --set valid_every=500
    $cli infer --family tsvad --data-dir "$work/test/data" --exp-dir "$work/tsvad_rev" \
      --emb-store "$work/test/embs.npz" --out "$work/hyp_tsvad_rev.rttm" \
      --threshold-sweep --ref "$work/test/data/rttm" \
      --set sample_rate=$rate --set n_mels=80 --set encoder_blocks=12,24,16 \
      --set rs_len=4.0
    ;;
  *)
    echo "unknown family: $fam" >&2
    exit 1
    ;;
  esac
}

for fam in $families; do
  echo "=== leaderboard family: $fam ==="
  if run_family "$fam"; then
    echo "=== family $fam DONE ==="
  else
    echo "=== family $fam FAILED (continuing) ==="
  fi
done
