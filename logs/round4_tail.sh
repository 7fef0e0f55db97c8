#!/usr/bin/env bash
# Revised tail after killing the original queue post-m2f: fixes that
# landed mid-round (SSND discovery protocol, OTS-VAD decode, EEND-VC
# oracle-k mode) + the missing rows, tightest-budget-first.
set -uo pipefail
cd /root/repo
work=exp/hermetic_tsvad

run() { local name=$1; shift; echo "=== $name start $(date)"; "$@" > "logs/r4_$name.log" 2>&1 && echo "=== $name OK $(date)" || echo "=== $name FAIL $(date)"; }

# 1. SSND retrain with the discovery-teaching query protocol (fast: ~12 min)
if [ -d "$work/ssnd" ] && [ ! -d "$work/r4a_ssnd" ]; then mv "$work/ssnd" "$work/r4a_ssnd"; fi
run ssnd2 env STEPS=4000 bash recipes/hermetic_leaderboard.sh ssnd

# 2. OTS-VAD re-infer with the Algorithm-1 decode (no retrain)
run ots_vad_reinfer python -m speaker_diarization_tpu.cli infer --family ots_vad \
  --data-dir "$work/test/data" --exp-dir "$work/ots_vad" \
  --out "$work/hyp_ots_vad.rttm" --threshold-sweep --ref "$work/test/data/rttm" \
  --set sample_rate=8000 --set n_mels=80 --set n_speakers=4 \
  --set rs_len=4.0 --set encoder_blocks=2,2,2,2 --set d_model=192 \
  --set n_layers=4 --set n_heads=4 --set d_ff=512

# 3. EEND-VC re-infer with oracle-k + sil 0.2 (no retrain)
run eend_vc_reinfer python -m speaker_diarization_tpu.cli infer --family eend_vc \
  --data-dir "$work/test/data" --exp-dir "$work/eend_vc" \
  --out "$work/hyp_eend_vc.rttm" --threshold-sweep --ref "$work/test/data/rttm" \
  --num-spks -1 --sil-spk-th 0.2 \
  --set sample_rate=8000 --set n_speakers=3 --set n_mels=23 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=200

# 4. missing rows
run streaming env STEPS=3000 bash recipes/hermetic_streaming_and_eda.sh 1 2
run eda env STEPS5=4000 bash recipes/hermetic_streaming_and_eda.sh 3 4
run mamba2 env STEPS=2500 bash recipes/hermetic_streaming_and_eda.sh 5 6
run eend3 env STEPS5=4000 bash recipes/hermetic_leaderboard.sh eend

# 5. extras
run ecapa env STEPS=1500 bash recipes/hermetic_leaderboard.sh ecapa
run enhancer_eval bash recipes/hermetic_leaderboard.sh enhancer_eval
echo "=== tail done $(date)"
