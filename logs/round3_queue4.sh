#!/bin/bash
# Final evidence queue v2 (priority order): waits for the running
# leaderboard (pid $1), then m2f rerun, sond/eend_vc/fs_eend top-ups,
# mamba2 row, streaming/EDA rows if the clock allows, then idle-chip
# bench + the microbench sections the earlier crash skipped.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
while kill -0 "$1" 2>/dev/null; do sleep 15; done
date
STEPS=3000 WORK=exp/hermetic_tsvad bash recipes/hermetic_leaderboard.sh m2f > logs/leaderboard_m2f.log 2>&1
date
STEPS=3000 WORK=exp/hermetic_tsvad bash recipes/hermetic_leaderboard.sh sond > logs/leaderboard_sond2.log 2>&1
date
STEPS=1200 WORK=exp/hermetic_tsvad bash recipes/hermetic_streaming_and_eda.sh 5 6 > logs/mamba2.log 2>&1
date
STEPS5=3500 WORK=exp/hermetic_tsvad bash recipes/hermetic_leaderboard.sh eend_vc > logs/leaderboard_vc2.log 2>&1
date
STEPS5=3500 WORK=exp/hermetic_tsvad bash recipes/hermetic_leaderboard.sh fs_eend > logs/leaderboard_fs2.log 2>&1
date
STEPS=1200 WORK=exp/hermetic_tsvad bash recipes/hermetic_streaming_and_eda.sh 1 2 > logs/stream.log 2>&1
date
STEPS5=1500 WORK=exp/hermetic_tsvad bash recipes/hermetic_streaming_and_eda.sh 3 4 > logs/eda.log 2>&1
date
timeout 600 python bench.py > logs/bench_idle.json 2> logs/bench_idle.err
timeout 900 python scripts/microbench.py scan fbank stream > logs/microbench2.log 2>&1
date
echo ROUND3_QUEUE4_DONE
