#!/bin/bash
# Round-5 measurement queue, phase 2: waits for phase 1, then runs the
# fixed live-input train bench, the serve latency table, the lmms rerun
# with engine precompile, and the train-stage traces.
set -u
cd /root/repo
while ! grep -q "ALL DONE" /tmp/r5_queue.log 2>/dev/null; do sleep 30; done
run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ===" | tee -a /tmp/r5_queue.log
  timeout 5400 python bench.py "$@" >/tmp/r5_${name}.log 2>&1
  echo "=== $name done rc=$? ($(date -u +%H:%M:%S)) ===" | tee -a /tmp/r5_queue.log
  tail -3 /tmp/r5_${name}.log | tee -a /tmp/r5_queue.log
}
run train_live2 train pt2 live
run serve_latency serve 32 96
run lmms_pre lmms 8 16
run prof_pt2 profile train
run prof_sft profile train-sft
run prof_dpo profile train-dpo
echo "PHASE2 DONE" >> /tmp/r5_queue.log
