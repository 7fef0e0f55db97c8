#!/usr/bin/env bash
# Round-5 TPU queue, part 2: retrain-resumes + perf measurement.
set -uo pipefail
cd /root/repo
work=exp/hermetic_tsvad
cli="python -m speaker_diarization_tpu.cli"
run() { local name=$1; shift; echo "=== $name start $(date)"; "$@" > "logs/r5_$name.log" 2>&1 && echo "=== $name OK $(date)" || echo "=== $name FAIL $(date)"; }

# Flagship TS-VAD retrain: exp/hermetic_tsvad/tsvad was found EMPTY (its
# round-3 checkpoints did not survive to round 5), which broke
# enhancer_eval. Same config as the 5.53% round-3 row (full_stack stage 4).
run tsvad_retrain $cli train --family tsvad --train-dir "$work/train/data" --valid-dir "$work/valid/data" \
  --exp-dir "$work/tsvad" --emb-store "$work/train/embs.npz,$work/valid/embs.npz" \
  --encoder-ckpt "$work/encoder.npz" --noise-dir "$work/noise" --resume \
  --set sample_rate=8000 --set n_mels=80 --set encoder_blocks=12,24,16 \
  --set rs_len=4.0 --set segment_shift=2.0 --set batch_size=64 \
  --set num_steps=4000 --set optimizer=adam --set schedule=poly \
  --set learning_rate=2e-4 --set warmup_steps=400 --set bf16=true \
  --set log_every=50 --set valid_every=500
run tsvad_infer $cli infer --family tsvad --data-dir "$work/test/data" --exp-dir "$work/tsvad" \
  --emb-store "$work/test/embs.npz" --out "$work/hyp_tsvad.rttm" \
  --threshold-sweep --ref "$work/test/data/rttm" \
  --set sample_rate=8000 --set n_mels=80 --set encoder_blocks=12,24,16 --set rs_len=4.0
run enhancer_eval2 bash recipes/hermetic_leaderboard.sh enhancer_eval

# M2F: resume 6000 -> 12000 (undertrained: FA 11.8 / SC 12.9 at best thr)
run m2f_resume $cli train --family eend_m2f --train-dir "$work/train/data" \
  --valid-dir "$work/valid/data" --exp-dir "$work/m2f" --resume \
  --set sample_rate=8000 --set n_speakers=3 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=500 --set batch_size=16 --set num_steps=10000 \
  --set optimizer=adam --set schedule=poly --set learning_rate=2e-4 \
  --set warmup_steps=400 --set bf16=true --set log_every=50 --set valid_every=1000
run m2f_infer $cli infer --family eend_m2f --data-dir "$work/test/data" \
  --exp-dir "$work/m2f" --out "$work/hyp_m2f.rttm" \
  --threshold-sweep --ref "$work/test/data/rttm" \
  --set sample_rate=8000 --set n_speakers=3 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=500

# EEND-VC: resume 5000 -> 10000 (decode quality still improving at 5000)
run vc_resume $cli train --family eend_vc --train-dir "$work/train/data" \
  --valid-dir "$work/valid/data" --exp-dir "$work/eend_vc" --resume \
  --set sample_rate=8000 --set n_speakers=3 --set n_mels=23 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=200 --set batch_size=32 --set num_steps=10000 \
  --set optimizer=adam --set schedule=noam --set learning_rate=1.0 \
  --set warmup_steps=1000 --set bf16=true --set log_every=50 --set valid_every=500
run vc_infer $cli infer --family eend_vc --data-dir "$work/test/data" \
  --exp-dir "$work/eend_vc" --out "$work/hyp_eend_vc.rttm" \
  --threshold-sweep --ref "$work/test/data/rttm" \
  --num-spks -1 --sil-spk-th 0.2 --step 10000 \
  --set sample_rate=8000 --set n_speakers=3 --set n_mels=23 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=200

# SSND: resume 8000 -> 12000 (ArcFace acc 0.71 and climbing; SC dominates)
run ssnd_resume $cli train --family ssnd --train-dir "$work/src" \
  --real-data-dir "$work/train/data" --exp-dir "$work/ssnd_r5" --resume \
  --set sample_rate=8000 --set rs_len=4.0 --set encoder_blocks=4,8,4 \
  --set batch_size=16 --set num_steps=12000 \
  --set optimizer=adam --set schedule=poly --set learning_rate=2e-4 \
  --set warmup_steps=400 --set bf16=true --set ssnd_arcface_weight=0.05 \
  --set log_every=50 --set valid_every=100000
run ssnd_infer $cli infer --family ssnd --data-dir "$work/test/data" \
  --exp-dir "$work/ssnd_r5" --out "$work/hyp_ssnd.rttm" \
  --threshold-sweep --ssnd-rescore --ref "$work/test/data/rttm" \
  --set sample_rate=8000 --set rs_len=4.0 --set encoder_blocks=4,8,4

# OTS-VAD: fine-tune at 2*rs_len windows (reference protocol — halves must
# equal the decode block length; our 4 s training windows gave 2 s
# enrollment halves vs 4 s decode blocks). T-independent params make the
# resume from the 4 s checkpoint valid.
run ots8_tune $cli train --family ots_vad --train-dir "$work/train/data" \
  --valid-dir "$work/valid/data" --exp-dir "$work/ots_vad" --resume \
  --noise-dir "$work/noise" \
  --set sample_rate=8000 --set n_mels=80 --set n_speakers=4 \
  --set rs_len=8.0 --set segment_shift=2.0 \
  --set encoder_blocks=2,2,2,2 --set d_model=192 --set n_layers=4 \
  --set n_heads=4 --set d_ff=512 \
  --set batch_size=8 --set num_steps=11000 \
  --set optimizer=adam --set schedule=poly --set learning_rate=1e-4 \
  --set warmup_steps=200 --set bf16=true \
  --set log_every=50 --set valid_every=1000
run ots8_infer $cli infer --family ots_vad --data-dir "$work/test/data" \
  --exp-dir "$work/ots_vad" --out "$work/hyp_ots_vad.rttm" \
  --threshold-sweep --ref "$work/test/data/rttm" \
  --set sample_rate=8000 --set n_mels=80 --set n_speakers=4 \
  --set rs_len=4.0 --set encoder_blocks=2,2,2,2 --set d_model=192 \
  --set n_layers=4 --set n_heads=4 --set d_ff=512

# EEND 3-spk on the enlarged simulated corpus (1200 mixtures from the same
# source pool; the 400-meeting train split overfit by step 1500 — valid
# 0.227 -> 0.57 — with only ~12 batches/epoch)
run eend3b $cli train --family eend --train-dir "$work/train_big/data" \
  --valid-dir "$work/valid/data" --exp-dir "$work/eend3b" --resume \
  --set sample_rate=8000 --set n_speakers=3 --set n_mels=23 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=500 --set batch_size=32 --set num_steps=4500 \
  --set optimizer=adam --set schedule=noam --set learning_rate=1.0 \
  --set warmup_steps=1000 --set bf16=true \
  --set log_every=50 --set valid_every=500
run eend3b_infer $cli infer --family eend --data-dir "$work/test/data" \
  --exp-dir "$work/eend3b" --out "$work/hyp_eend3.rttm" \
  --threshold-sweep --ref "$work/test/data/rttm" \
  --set sample_rate=8000 --set n_speakers=3 --set n_mels=23 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=500

# perf: train MFU record, stage profile with the new kernels, bench
run microbench python scripts/microbench.py
run profile_parts2 python scripts/tsvad_profile_parts.py
run bench_final python bench.py

echo "=== queue2 done $(date)"
