#!/bin/bash
# Round-5 measurement queue, phase 4: rerun the live-input train bench now
# that the trainer's timing meters reset per log window (the first run's
# 25-minute compile bled into every window's reported throughput).
set -u
cd /root/repo
while ! grep -q "PHASE3 DONE" /tmp/r5_queue.log 2>/dev/null; do sleep 30; done
run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ===" | tee -a /tmp/r5_queue.log
  timeout 5400 python bench.py "$@" >/tmp/r5_${name}.log 2>&1
  echo "=== $name done rc=$? ($(date -u +%H:%M:%S)) ===" | tee -a /tmp/r5_queue.log
  tail -3 /tmp/r5_${name}.log | tee -a /tmp/r5_queue.log
}
run train_live3 train pt2 live 36
echo "PHASE4 DONE" >> /tmp/r5_queue.log
