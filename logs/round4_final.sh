#!/usr/bin/env bash
set -uo pipefail
cd /root/repo
work=exp/hermetic_tsvad
run() { local name=$1; shift; echo "=== $name start $(date)"; "$@" > "logs/r4_$name.log" 2>&1 && echo "=== $name OK $(date)" || echo "=== $name FAIL $(date)"; }
run eend3 env STEPS5=2500 bash recipes/hermetic_leaderboard.sh eend
run ecapa env STEPS=1000 bash recipes/hermetic_leaderboard.sh ecapa
run enhancer_eval bash recipes/hermetic_leaderboard.sh enhancer_eval
echo "=== final done $(date)"
