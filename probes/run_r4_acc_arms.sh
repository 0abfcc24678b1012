#!/bin/bash
# Round-4 hard-task accuracy finetune arms, one PROCESS per arm.
#
# Why per-process: the dev tunnel's axon client leaks every H2D transfer's
# host buffer (measured ~100% of bytes, CLAUDE.md); the round-4 in-process
# 40-epoch scratch arm OOM-killed at 130 GB RSS. One arm per process resets
# RSS, the supervised device cache (ACC_SUP_CACHE=1 default) removes the
# per-step H2D, and mid-arm checkpoint resume (save_every 5) bounds the cost
# of any remaining kill to <=5 epochs. Pretrain phase is already complete and
# reused (ACC_REUSE_PRETRAIN default). One TPU process at a time.
set -u
cd /root/repo
LOG=/tmp/r4_acc_arms.log
: > "$LOG"
run_arm() {
  local arm=$1 tries=0
  while [ $tries -lt 4 ]; do
    tries=$((tries + 1))
    echo "=== arm $arm try $tries [$(date +%H:%M:%S)]" >> "$LOG"
    timeout 14400 env ACC_HARD=1 ACC_PRETRAIN_EPOCHS=50 ACC_ITERS=100 \
      ACC_FT_EPOCHS=20 ACC_FT_EPOCHS_SCRATCH=40 ACC_SAVE_EVERY=10 \
      ACC_RESUME=1 ACC_ARMS="$arm" \
      python probes/accuracy_loop.py >> "$LOG" 2>&1
    local rc=$?
    echo "--- arm $arm exit=$rc [$(date +%H:%M:%S)]" >> "$LOG"
    [ $rc -eq 0 ] && return 0
    sleep 60   # let the tunnel drop any stale session before retrying
  done
  return 1
}
run_arm scratch
run_arm pretrained
echo "ACC ARMS DONE [$(date +%H:%M:%S)]" >> "$LOG"
