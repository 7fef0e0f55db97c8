#!/bin/bash
# wait for queue1 (pid $1), then run the full hermetic leaderboard
set -x
while kill -0 "$1" 2>/dev/null; do sleep 30; done
cd /root/repo
WORK=exp/hermetic_tsvad bash recipes/hermetic_leaderboard.sh > logs/leaderboard.log 2>&1
echo QUEUE2_DONE
