#!/bin/bash
# Round-5 measurement queue: runs the benches whose machinery landed at the
# end of the last session but whose on-chip numbers were never recorded.
# Sequential (one chip); each bench logs to /tmp/r5_<name>.log.
set -u
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ===" | tee -a /tmp/r5_queue.log
  timeout 5400 python bench.py "$@" >/tmp/r5_${name}.log 2>&1
  echo "=== $name done rc=$? ($(date -u +%H:%M:%S)) ===" | tee -a /tmp/r5_queue.log
  tail -3 /tmp/r5_${name}.log | tee -a /tmp/r5_queue.log
}
run lmms_serving lmms 8 16 32
run sft_flash train sft flash
run sft_dense train sft
run train_live train pt2 live
run images images
echo "ALL DONE" >> /tmp/r5_queue.log
