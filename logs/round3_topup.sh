#!/bin/bash
# Top-up pass: resume the weakest leaderboard families to 3000 steps
# (first pass was STEPS=1000 to guarantee one row per family), then re-run
# the remaining microbench sections and an idle-chip bench.
# Usage: bash logs/round3_topup.sh "<families>" [steps]
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
fams=${1:-"sond"}
steps=${2:-3000}
STEPS=$steps STEPS5=$steps WORK=exp/hermetic_tsvad \
  bash recipes/hermetic_leaderboard.sh $fams > logs/leaderboard_topup.log 2>&1
echo TOPUP_DONE
