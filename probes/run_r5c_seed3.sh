#!/bin/bash
# Round-5c: one more seed for the low-label arms (4 total with the seed-0
# baseline + r5b's seeds 1,2). Waits for the r5b queue to release the chip
# (ONE axon process at a time — CLAUDE.md tunnel rules).
set -u
cd /root/repo
LOG=/tmp/r5c_seed3.log
: > "$LOG"
echo "waiting for r5b [$(date +%H:%M:%S)]" >> "$LOG"
while ! grep -q "R5B DONE" /tmp/r5b_queue.log 2>/dev/null; do sleep 60; done

run_arm() {
  local seed=$1 arm=$2 tries=0
  while [ $tries -lt 2 ]; do
    tries=$((tries + 1))
    echo "=== seed $seed arm $arm try $tries [$(date +%H:%M:%S)]" >> "$LOG"
    timeout 10800 env ACC_HARD=1 ACC_PRETRAIN_EPOCHS=50 ACC_ITERS=100 \
      ACC_FT_EPOCHS=40 ACC_FT_EPOCHS_SCRATCH=40 ACC_SAVE_EVERY=10 \
      ACC_RESUME=1 ACC_LOWLABEL_ARMS=1 ACC_FT_SEED="$seed" \
      ACC_ARMS="${arm}_s${seed}" \
      python probes/accuracy_loop.py >> "$LOG" 2>&1
    local rc=$?
    echo "--- seed $seed arm $arm exit=$rc [$(date +%H:%M:%S)]" >> "$LOG"
    [ $rc -eq 0 ] && return 0
    sleep 60
  done
  return 1
}
run_arm 3 scratch_low3
run_arm 3 pretrained_low3
echo "R5C DONE [$(date +%H:%M:%S)]" >> "$LOG"
