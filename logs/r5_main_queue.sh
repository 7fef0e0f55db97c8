#!/usr/bin/env bash
# Round-5 main TPU queue (this session). Filesystem was reset to git state,
# so every artifact is rebuilt: encoder -> embeddings -> family rows.
# Jobs are serialized (single TPU client — concurrent clients wedge the
# axon relay) and individually capped with `timeout` so one hang cannot
# consume the round.
set -uo pipefail
cd /root/repo
work=exp/hermetic_tsvad
cli="python -m speaker_diarization_tpu.cli"
run() { local name=$1 tmo=$2; shift 2; echo "=== $name start $(date)"; timeout "$tmo" "$@" > "logs/r5_$name.log" 2>&1 && echo "=== $name OK $(date)" || echo "=== $name FAIL($?) $(date)"; }

# encoder pretrain + export + targets + embeddings (gates everything)
run stage23 5400 bash recipes/hermetic_tsvad_full_stack.sh 2 3

# flagship TS-VAD (row + enhancer_eval dependency)
run tsvad_train 3600 bash recipes/hermetic_tsvad_full_stack.sh 4 4
run tsvad_infer 2400 bash recipes/hermetic_tsvad_full_stack.sh 5 5

# SSND: dual simu+real protocol (round-5 domain fix), 8000 steps + rescore
run ssnd 7200 bash recipes/hermetic_leaderboard.sh ssnd

# EEND 3-spk re-base on the 1200-mixture corpus
run eend3b 3600 $cli train --family eend --train-dir "$work/train_big/data" \
  --valid-dir "$work/valid/data" --exp-dir "$work/eend3b" --resume \
  --set sample_rate=8000 --set n_speakers=3 --set n_mels=23 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=500 --set batch_size=32 --set num_steps=4500 \
  --set optimizer=adam --set schedule=noam --set learning_rate=1.0 \
  --set warmup_steps=1000 --set bf16=true \
  --set log_every=50 --set valid_every=500
run eend3b_infer 2400 $cli infer --family eend --data-dir "$work/test/data" \
  --exp-dir "$work/eend3b" --out "$work/hyp_eend3.rttm" \
  --threshold-sweep --ref "$work/test/data/rttm" \
  --set sample_rate=8000 --set n_speakers=3 --set n_mels=23 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=500

# EEND-VC to 10k steps, latest-ckpt decode (round-5 checkpoint policy)
run eend_vc 5400 env STEPS5=10000 bash recipes/hermetic_leaderboard.sh eend_vc

# OTS-VAD at 2*rs_len training windows (reference protocol: enrollment
# halves must equal the decode block length)
run ots8 7200 $cli train --family ots_vad --train-dir "$work/train/data" \
  --valid-dir "$work/valid/data" --exp-dir "$work/ots_vad" --resume \
  --noise-dir "$work/noise" \
  --set sample_rate=8000 --set n_mels=80 --set n_speakers=4 \
  --set rs_len=8.0 --set segment_shift=2.0 \
  --set encoder_blocks=2,2,2,2 --set d_model=192 --set n_layers=4 \
  --set n_heads=4 --set d_ff=512 \
  --set batch_size=8 --set num_steps=8000 \
  --set optimizer=adam --set schedule=poly --set learning_rate=1e-4 \
  --set warmup_steps=200 --set bf16=true \
  --set log_every=50 --set valid_every=1000
run ots8_infer 2400 $cli infer --family ots_vad --data-dir "$work/test/data" \
  --exp-dir "$work/ots_vad" --out "$work/hyp_ots_vad.rttm" \
  --threshold-sweep --ref "$work/test/data/rttm" \
  --set sample_rate=8000 --set n_mels=80 --set n_speakers=4 \
  --set rs_len=4.0 --set encoder_blocks=2,2,2,2 --set d_model=192 \
  --set n_layers=4 --set n_heads=4 --set d_ff=512

# M2F to 10k with the new per-frame top-k decode cap
run m2f 7200 env STEPS=10000 bash recipes/hermetic_leaderboard.sh m2f

# ecapa encoder row + enhancer eval + vbx baseline
run ecapa 5400 env STEPS=2500 bash recipes/hermetic_leaderboard.sh ecapa
run enhancer_eval 5400 bash recipes/hermetic_leaderboard.sh enhancer_eval
run vbx 2400 bash recipes/hermetic_leaderboard.sh vbx

# perf record: train MFU + stage profile + final bench
run microbench 3600 python scripts/microbench.py
run profile_parts 2400 python scripts/tsvad_profile_parts.py
run bench_final 3600 python bench.py

echo "=== r5 main queue done $(date)"
