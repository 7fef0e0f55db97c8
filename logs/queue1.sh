#!/bin/bash
# TPU job queue: wait for stage 1-3 (pid $1), then TS-VAD train+infer,
# then streaming/EDA/mamba2 recipe.
set -x
while kill -0 "$1" 2>/dev/null; do sleep 20; done
cd /root/repo
WORK=exp/hermetic_tsvad bash recipes/hermetic_tsvad_full_stack.sh 4 5 > logs/tsvad_train.log 2>&1
WORK=exp/hermetic_tsvad bash recipes/hermetic_streaming_and_eda.sh 1 6 > logs/stream_eda_mamba.log 2>&1
echo QUEUE1_DONE
