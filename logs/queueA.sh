#!/bin/bash
# Round-3 continuation queue: wait for stage 2-3 (pid $1), then the full
# hermetic leaderboard, then streaming/EDA/mamba2 DER rows, then bench +
# microbench on the idle chip.
set -x
while kill -0 "$1" 2>/dev/null; do sleep 20; done
cd /root/repo
STEPS=2500 STEPS5=3000 WORK=exp/hermetic_tsvad \
  bash recipes/hermetic_leaderboard.sh > logs/leaderboard.log 2>&1
STEPS=2500 STEPS5=3000 WORK=exp/hermetic_tsvad \
  bash recipes/hermetic_streaming_and_eda.sh 1 6 > logs/stream_eda_mamba.log 2>&1
timeout 1200 python bench.py > logs/bench_idle.json 2> logs/bench_idle.err
timeout 3000 python scripts/microbench.py > logs/microbench_idle.log 2>&1
echo QUEUEA_DONE
