#!/bin/bash
# Round-3 evidence queue (serialized on the single TPU chip):
#   1. hermetic corpus + spk encoder pretrain + targets/embeddings (stages 1-3)
#   2. audited bench.py (idle chip) -> logs/bench_idle.json
#   3. witness microbenchmarks -> logs/microbench_idle.log
#   4. hermetic DER leaderboard, all families (budgeted steps; --resume
#      makes later top-ups cheap)
#   5. streaming + EDA + mamba2 DER rows
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
date
WORK=exp/hermetic_tsvad bash recipes/hermetic_tsvad_full_stack.sh 1 3 > logs/stage13.log 2>&1
date
timeout 900 python bench.py > logs/bench_idle.json 2> logs/bench_idle.err
date
timeout 2000 python scripts/microbench.py > logs/microbench_idle.log 2>&1
date
STEPS=1000 STEPS5=1200 WORK=exp/hermetic_tsvad \
  bash recipes/hermetic_leaderboard.sh sond m2f fs_eend eend_vc tsvad3 ots_vad ssnd tsvad_rev \
  > logs/leaderboard.log 2>&1
date
STEPS=1000 STEPS5=1200 WORK=exp/hermetic_tsvad \
  bash recipes/hermetic_streaming_and_eda.sh 1 6 > logs/stream_eda_mamba.log 2>&1
date
echo ROUND3_QUEUE_DONE
