#!/bin/bash
# wait for queue2 (pid $1), then run bench + microbench on the idle chip
set -x
while kill -0 "$1" 2>/dev/null; do sleep 60; done
cd /root/repo
timeout 1200 python bench.py > logs/bench_idle.json 2> logs/bench_idle.err
timeout 3500 python scripts/microbench.py > logs/microbench_idle.log 2>&1
echo QUEUE3_DONE
