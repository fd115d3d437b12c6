#!/bin/bash
# Round-5 queue, phase 3: waits for BOTH the phase-2 benches and the full
# test suite (launched in parallel with the device-bound profile stages; it
# must not overlap the host-sensitive serving benches below), then runs the
# slot-count lever and the engine's own per-step trace.
set -u
cd /root/repo
while ! grep -q "PHASE2 DONE" /tmp/r5_queue.log 2>/dev/null \
   || ! grep -q "suite done" /tmp/r5_queue.log 2>/dev/null; do sleep 30; done
run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ===" | tee -a /tmp/r5_queue.log
  timeout 5400 python bench.py "$@" >/tmp/r5_${name}.log 2>&1
  echo "=== $name done rc=$? ($(date -u +%H:%M:%S)) ===" | tee -a /tmp/r5_queue.log
  tail -3 /tmp/r5_${name}.log | tee -a /tmp/r5_queue.log
}
run lmms_slots32 lmms 16 32 slots32
run prof_engine profile engine
echo "PHASE3 DONE" >> /tmp/r5_queue.log
