#!/bin/bash
# Round-5 queue, phase 5: relay-health yardstick + lmms serving re-measure.
# The 22:51 lmms rerun measured 843 tok/s at bs=16 with clean loop stats vs
# 1,464 an hour earlier on identical code — vqa 32 int8+kv has a stable
# 4,383-4,424 tok/s history and disambiguates relay contention from a real
# regression.
set -u
cd /root/repo
while ! grep -q "PHASE4 DONE" /tmp/r5_queue.log 2>/dev/null; do sleep 30; done
run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ===" | tee -a /tmp/r5_queue.log
  timeout 5400 python bench.py "$@" >/tmp/r5_${name}.log 2>&1
  echo "=== $name done rc=$? ($(date -u +%H:%M:%S)) ===" | tee -a /tmp/r5_queue.log
  tail -3 /tmp/r5_${name}.log | tee -a /tmp/r5_queue.log
}
run vqa_yardstick vqa 32 int8+kv
run lmms_recheck lmms 16
echo "PHASE5 DONE" >> /tmp/r5_queue.log
