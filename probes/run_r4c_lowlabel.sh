#!/bin/bash
# Round-4c: label-efficiency arms (3 labeled cases, fold 5) — the SSL claim
# the full-data arms can't show (scratch saturates the 12-case task). One
# process per arm (axon H2D leak, CLAUDE.md); waits for the r4b queue.
set -u
cd /root/repo
LOG=/tmp/r4c_lowlabel.log
: > "$LOG"
echo "waiting for r4b queue [$(date +%H:%M:%S)]" >> "$LOG"
while ! grep -q "R4B QUEUE DONE" /tmp/r4b_queue.log 2>/dev/null; do
  sleep 30
done
for arm in scratch_low3 pretrained_low3; do
  tries=0
  while [ $tries -lt 3 ]; do
    tries=$((tries + 1))
    echo "=== arm $arm try $tries [$(date +%H:%M:%S)]" >> "$LOG"
    timeout 7200 env ACC_HARD=1 ACC_PRETRAIN_EPOCHS=50 ACC_ITERS=100 \
      ACC_FT_EPOCHS=20 ACC_FT_EPOCHS_SCRATCH=40 ACC_SAVE_EVERY=10 \
      ACC_RESUME=1 ACC_LOWLABEL_ARMS=1 ACC_ARMS="$arm" \
      python probes/accuracy_loop.py >> "$LOG" 2>&1
    rc=$?
    echo "--- arm $arm exit=$rc [$(date +%H:%M:%S)]" >> "$LOG"
    [ $rc -eq 0 ] && break
    sleep 60
  done
done
echo "R4C DONE [$(date +%H:%M:%S)]" >> "$LOG"
