#!/usr/bin/env bash
# Round-4 hermetic queue: retrain the five failing families with their
# root-cause fixes, fill the missing leaderboard rows, add the VBx/ECAPA/
# enhancer rows. Sequential — exactly one TPU client at a time.
set -uo pipefail
cd /root/repo
work=exp/hermetic_tsvad

# archive round-3 checkpoints of families whose loss/model changed
for d in eend_vc sond ssnd m2f; do
  if [ -d "$work/$d" ] && [ ! -d "$work/r3_$d" ]; then mv "$work/$d" "$work/r3_$d"; fi
done

run() { local name=$1; shift; echo "=== $name start $(date)"; "$@" > "logs/r4_$name.log" 2>&1 && echo "=== $name OK $(date)" || echo "=== $name FAIL $(date)"; }

run eend_vc env STEPS5=5000 bash recipes/hermetic_leaderboard.sh eend_vc
run sond    env STEPS=3000  bash recipes/hermetic_leaderboard.sh sond
run ssnd    env STEPS=4000  bash recipes/hermetic_leaderboard.sh ssnd
run vbx     bash recipes/hermetic_leaderboard.sh vbx
run ots_vad env STEPS=4000  bash recipes/hermetic_leaderboard.sh ots_vad
run m2f     env STEPS=6000  bash recipes/hermetic_leaderboard.sh m2f
run eend3   env STEPS5=5000 bash recipes/hermetic_leaderboard.sh eend
run streaming env STEPS=4000 bash recipes/hermetic_streaming_and_eda.sh 1 2
run eda     env STEPS5=5000 bash recipes/hermetic_streaming_and_eda.sh 3 4
run mamba2  env STEPS=3000  bash recipes/hermetic_streaming_and_eda.sh 5 6
run ecapa   env STEPS=2000  bash recipes/hermetic_leaderboard.sh ecapa
run enhancer_eval bash recipes/hermetic_leaderboard.sh enhancer_eval
echo "=== queue done $(date)"
