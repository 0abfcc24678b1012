#!/bin/bash
# Round-5b TPU queue (ONE axon process at a time, CLAUDE.md):
#   1. bs16 micro2-scan-remat bench arm — re-earns the round-4 number whose
#      log lived in /tmp and was lost (VERDICT r4 item 6, PLAN.md:40)
#   2. supervised 5-epoch benchmark through the DEFAULT config
#      (device_cache=None -> auto-gate; VERDICT item 4) -> BENCH_supervised_r05
#      Each variant runs in its OWN process so peak-RSS is per-variant.
#   3. accuracy-loop pretrain (50 epochs, hard task) — /tmp/acc was wiped
#      between rounds, so the SSL checkpoint the seed arms share is rebuilt
#   4. 4 finetune seed arms (seeds 1, 2 x scratch_low3/pretrained_low3,
#      40 epochs matched budget; VERDICT item 5), one process per arm
# Waits for the r5a XLA sweep to release the chip.
set -u
cd /root/repo
LOG=/tmp/r5b_queue.log
: > "$LOG"
echo "waiting for r5a [$(date +%H:%M:%S)]" >> "$LOG"
while ! grep -q "R5A DONE" /tmp/r5a_xla_opts.log 2>/dev/null; do sleep 30; done

echo "=== inference ceiling probe [$(date +%H:%M:%S)]" >> "$LOG"
timeout 7200 python probes/probe_inference_ceiling.py >> "$LOG" 2>&1
echo "--- exit=$? [$(date +%H:%M:%S)]" >> "$LOG"

echo "=== bench_inference (r05 artifact input) [$(date +%H:%M:%S)]" >> "$LOG"
timeout 7200 python bench_inference.py >> "$LOG" 2>&1
echo "--- exit=$? [$(date +%H:%M:%S)]" >> "$LOG"

echo "=== bs16 micro2 scan remat (per-conv bs8) [$(date +%H:%M:%S)]" >> "$LOG"
timeout 5400 env ATK_BENCH_BATCH=16 ATK_BENCH_MICRO=2 ATK_BENCH_REMAT=1 \
  python bench.py >> "$LOG" 2>&1
echo "--- exit=$? [$(date +%H:%M:%S)]" >> "$LOG"

for variant in ATKTrainerBenchmark_5epochs_noDataLoading \
               ATKTrainerBenchmark_5epochs_default; do
  echo "=== supervised benchmark $variant [$(date +%H:%M:%S)]" >> "$LOG"
  timeout 7200 env BM_ONLY="$variant" \
    python probes/run_supervised_benchmark.py >> "$LOG" 2>&1
  echo "--- exit=$? [$(date +%H:%M:%S)]" >> "$LOG"
done

echo "=== accuracy pretrain (50 epochs) [$(date +%H:%M:%S)]" >> "$LOG"
tries=0
while [ $tries -lt 3 ]; do
  tries=$((tries + 1))
  timeout 14400 env ACC_HARD=1 ACC_PRETRAIN_EPOCHS=50 ACC_ITERS=100 \
    ACC_SAVE_EVERY=10 ACC_RESUME=1 ACC_SKIP_FT=1 \
    python probes/accuracy_loop.py >> "$LOG" 2>&1
  rc=$?
  echo "--- pretrain exit=$rc try=$tries [$(date +%H:%M:%S)]" >> "$LOG"
  [ $rc -eq 0 ] && break
  sleep 60
done

run_arm() {
  local seed=$1 arm=$2 tries=0
  while [ $tries -lt 3 ]; do
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
for seed in 1 2; do
  run_arm "$seed" scratch_low3
  run_arm "$seed" pretrained_low3
done
echo "R5B DONE [$(date +%H:%M:%S)]" >> "$LOG"
