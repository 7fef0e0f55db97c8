#!/usr/bin/env bash
# Round-5 TPU queue, part 1 (serialized single-client jobs).
set -uo pipefail
cd /root/repo
work=exp/hermetic_tsvad
run() { local name=$1; shift; echo "=== $name start $(date)"; "$@" > "logs/r5_$name.log" 2>&1 && echo "=== $name OK $(date)" || echo "=== $name FAIL $(date)"; }
run profile_parts python scripts/tsvad_profile_parts.py
run eend3 env STEPS5=5000 bash recipes/hermetic_leaderboard.sh eend
run ecapa env STEPS=2500 bash recipes/hermetic_leaderboard.sh ecapa
run enhancer_eval bash recipes/hermetic_leaderboard.sh enhancer_eval
run ots_vad env STEPS=8000 bash recipes/hermetic_leaderboard.sh ots_vad
echo "=== queue1 done $(date)"
