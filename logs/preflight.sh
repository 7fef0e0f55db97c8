#!/bin/bash
# CPU preflight of leaderboard families: 3-step train + tiny infer through
# the EXACT CLI surfaces the leaderboard uses, so runtime failures surface
# before the chip gets to each family. Families needing stage-3 artifacts
# (sond/tsvad3/tsvad_rev) run once those exist.
set -x
cd /root/repo
export SDT_PLATFORM=cpu PYTHONUNBUFFERED=1
work=exp/hermetic_tsvad
rate=8000
cli="python -m speaker_diarization_tpu.cli"
pf=/tmp/preflight
mkdir -p $pf/test/data
# 2-meeting subset of the test dir
for f in wav.scp reco2dur segments spk2utt utt2spk; do
  [ -f $work/test/data/$f ] && grep -E "mix_000000[12]" $work/test/data/$f > $pf/test/data/$f
done
grep -E "mix_000000[12]" $work/test/data/rttm > $pf/test/data/rttm

run() { timeout 900 nice -n 15 "$@"; }

# m2f
run $cli train --family eend_m2f --train-dir "$work/train/data" \
  --exp-dir "$pf/m2f" \
  --set sample_rate=$rate --set n_speakers=3 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=500 --set batch_size=2 --set num_steps=3 \
  --set optimizer=adam --set schedule=poly --set learning_rate=2e-4 \
  --set warmup_steps=400 --set bf16=false --set log_every=1 --set valid_every=100000 \
  && run $cli infer --family eend_m2f --data-dir "$pf/test/data" \
  --exp-dir "$pf/m2f" --out "$pf/hyp_m2f.rttm" \
  --threshold-sweep --ref "$pf/test/data/rttm" \
  --set sample_rate=$rate --set n_speakers=3 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=500 && echo "PREFLIGHT m2f OK" || echo "PREFLIGHT m2f FAILED"

# fs_eend
run $cli train --family fs_eend --train-dir "$work/train/data" \
  --exp-dir "$pf/fs_eend" \
  --set sample_rate=$rate --set n_speakers=3 --set n_mels=23 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=500 --set batch_size=2 --set num_steps=3 \
  --set optimizer=adam --set schedule=noam --set learning_rate=1.0 \
  --set warmup_steps=1000 --set bf16=false --set log_every=1 --set valid_every=100000 \
  && run $cli infer --family fs_eend --data-dir "$pf/test/data" \
  --exp-dir "$pf/fs_eend" --out "$pf/hyp_fs_eend.rttm" \
  --threshold-sweep --ref "$pf/test/data/rttm" \
  --set sample_rate=$rate --set n_speakers=3 --set n_mels=23 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=500 && echo "PREFLIGHT fs_eend OK" || echo "PREFLIGHT fs_eend FAILED"

# eend_vc
run $cli train --family eend_vc --train-dir "$work/train/data" \
  --exp-dir "$pf/eend_vc" \
  --set sample_rate=$rate --set n_speakers=3 --set n_mels=23 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=200 --set batch_size=2 --set num_steps=3 \
  --set optimizer=adam --set schedule=noam --set learning_rate=1.0 \
  --set warmup_steps=1000 --set bf16=false --set log_every=1 --set valid_every=100000 \
  && run $cli infer --family eend_vc --data-dir "$pf/test/data" \
  --exp-dir "$pf/eend_vc" --out "$pf/hyp_eend_vc.rttm" \
  --threshold-sweep --ref "$pf/test/data/rttm" \
  --set sample_rate=$rate --set n_speakers=3 --set n_mels=23 \
  --set d_model=256 --set d_ff=1024 --set n_layers=4 --set n_heads=4 \
  --set chunk_frames=200 && echo "PREFLIGHT eend_vc OK" || echo "PREFLIGHT eend_vc FAILED"

# ots_vad
run $cli train --family ots_vad --train-dir "$work/train/data" \
  --exp-dir "$pf/ots_vad" --noise-dir "$work/noise" \
  --set sample_rate=$rate --set n_mels=80 --set n_speakers=4 \
  --set rs_len=4.0 --set segment_shift=2.0 \
  --set encoder_blocks=2,2,2,2 --set d_model=192 --set n_layers=4 \
  --set n_heads=4 --set d_ff=512 \
  --set batch_size=2 --set num_steps=3 \
  --set optimizer=adam --set schedule=poly --set learning_rate=2e-4 \
  --set warmup_steps=400 --set bf16=false --set log_every=1 --set valid_every=100000 \
  && run $cli infer --family ots_vad --data-dir "$pf/test/data" \
  --exp-dir "$pf/ots_vad" --out "$pf/hyp_ots_vad.rttm" \
  --threshold-sweep --ref "$pf/test/data/rttm" \
  --set sample_rate=$rate --set n_mels=80 --set n_speakers=4 \
  --set rs_len=4.0 --set encoder_blocks=2,2,2,2 --set d_model=192 \
  --set n_layers=4 --set n_heads=4 --set d_ff=512 && echo "PREFLIGHT ots_vad OK" || echo "PREFLIGHT ots_vad FAILED"

# ssnd
run $cli train --family ssnd --train-dir "$work/src" \
  --exp-dir "$pf/ssnd" \
  --set sample_rate=$rate --set rs_len=4.0 \
  --set encoder_blocks=4,8,4 \
  --set batch_size=2 --set num_steps=3 \
  --set optimizer=adam --set schedule=poly --set learning_rate=2e-4 \
  --set warmup_steps=400 --set bf16=false --set log_every=1 --set valid_every=100000 \
  && run $cli infer --family ssnd --data-dir "$pf/test/data" \
  --exp-dir "$pf/ssnd" --out "$pf/hyp_ssnd.rttm" \
  --threshold-sweep --ref "$pf/test/data/rttm" \
  --set sample_rate=$rate --set rs_len=4.0 --set encoder_blocks=4,8,4 \
  && echo "PREFLIGHT ssnd OK" || echo "PREFLIGHT ssnd FAILED"

echo PREFLIGHT_PHASE1_DONE
