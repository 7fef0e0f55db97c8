#!/bin/bash
# Round-3 continuation queue: wait for stage 1-3 (pid $1), then the full
# hermetic leaderboard (reduced step budget to fit the wall clock), then
# streaming/EDA/mamba2 DER rows, then bench + microbench on the idle chip.
set -x
while kill -0 "$1" 2>/dev/null; do sleep 20; done
cd /root/repo
STEPS=2000 STEPS5=2500 WORK=exp/hermetic_tsvad \
  bash recipes/hermetic_leaderboard.sh > logs/leaderboard.log 2>&1
STEPS=2000 STEPS5=2500 WORK=exp/hermetic_tsvad \
  bash recipes/hermetic_streaming_and_eda.sh 1 6 > logs/stream_eda_mamba.log 2>&1
echo QUEUEA_DONE
