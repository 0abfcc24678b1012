#!/bin/bash
# Round-4b TPU queue: runs after the accuracy arms finish (one axon process
# at a time). 1) supervised 5-epoch benchmark through the device cache
# (adds the _deviceCache variant to BENCH_supervised_r04.json); 2) fresh
# 4-epoch e2e pretrain timing with the val device cache (separate results
# root so the 50-epoch checkpoint_final the pretrained arm needs is never
# touched).
set -u
cd /root/repo
LOG=/tmp/r4b_queue.log
: > "$LOG"
echo "waiting for accuracy arms [$(date +%H:%M:%S)]" >> "$LOG"
while ! grep -q "ACC ARMS DONE" /tmp/r4_acc_arms.log 2>/dev/null; do
  sleep 30
done
echo "arms done, starting queue [$(date +%H:%M:%S)]" >> "$LOG"

echo "=== supervised benchmark (device cache) [$(date +%H:%M:%S)]" >> "$LOG"
timeout 7200 env BM_ONLY=ATKTrainerBenchmark_5epochs_deviceCache \
  python probes/run_supervised_benchmark.py >> "$LOG" 2>&1
echo "--- exit=$? [$(date +%H:%M:%S)]" >> "$LOG"

echo "=== e2e pretrain timing w/ val cache [$(date +%H:%M:%S)]" >> "$LOG"
timeout 7200 env ATK_results=/tmp/acc/res2 ACC_HARD=1 ACC_PRETRAIN_EPOCHS=4 \
  ACC_ITERS=100 ACC_SKIP_FT=1 ACC_REUSE_PRETRAIN=0 ACC_SAVE_EVERY=10 \
  python probes/accuracy_loop.py >> "$LOG" 2>&1
echo "--- exit=$? [$(date +%H:%M:%S)]" >> "$LOG"
echo "R4B QUEUE DONE [$(date +%H:%M:%S)]" >> "$LOG"
