#!/bin/bash
# Round-3 evidence queue v2 (waits for the already-running stage 1-3 child,
# then serializes all TPU jobs):
#   1. witness microbenchmarks -> logs/microbench_idle.log (RESULTS.md numbers)
#   2. hermetic DER leaderboard, 8 families (STEPS=1000; --resume allows top-ups)
#   3. mamba2-backend TS-VAD DER (stream_eda recipe stages 5-6)
#   4. streaming TS-VAD + EEND-EDA DER rows (stages 1-4) if time remains
#   5. audited bench.py on the then-idle chip
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/repo/exp/jax_cache
while kill -0 "$1" 2>/dev/null; do sleep 15; done
date
timeout 1500 python scripts/microbench.py > logs/microbench_idle.log 2>&1
date
STEPS=1000 STEPS5=1200 WORK=exp/hermetic_tsvad \
  bash recipes/hermetic_leaderboard.sh sond m2f fs_eend eend_vc tsvad3 ots_vad ssnd tsvad_rev \
  > logs/leaderboard.log 2>&1
date
STEPS=1000 STEPS5=1200 WORK=exp/hermetic_tsvad \
  bash recipes/hermetic_streaming_and_eda.sh 5 6 > logs/mamba2.log 2>&1
date
STEPS=1000 STEPS5=1200 WORK=exp/hermetic_tsvad \
  bash recipes/hermetic_streaming_and_eda.sh 1 4 > logs/stream_eda.log 2>&1
date
timeout 900 python bench.py > logs/bench_idle.json 2> logs/bench_idle.err
date
echo ROUND3_QUEUE2_DONE
