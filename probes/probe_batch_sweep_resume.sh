#!/bin/bash
# Resume of probe_batch_sweep.sh from config 3 (configs 1-2 completed before
# the round-4 session restart killed config 3 mid-compile; results in
# /tmp/batch_sweep_r4.log): bs4=7.872 (spread 0.3%), bs8 micro2=7.927.
set -u
cd /root/repo
LOG=/tmp/batch_sweep_r4.log
run() {
  desc="$1"; shift
  echo "=== $desc [$(date +%H:%M:%S)]" >> "$LOG"
  env "$@" timeout 3600 python bench.py >> "$LOG" 2>&1
  echo "--- exit=$? [$(date +%H:%M:%S)]" >> "$LOG"
}
run "bs8 micro1 remat (per-conv bs8: MXU efficiency probe)" \
    ATK_BENCH_BATCH=8 ATK_BENCH_MICRO=1 ATK_BENCH_REMAT=1
run "bs4 micro2 scan + input-side zconcat" \
    ATK_BENCH_BATCH=4 ATK_BENCH_MICRO=2 ATK_ZCONCAT_SIDE=input
run "bs16 micro2 scan remat (per-conv bs8)" \
    ATK_BENCH_BATCH=16 ATK_BENCH_MICRO=2 ATK_BENCH_REMAT=1
echo "SWEEP DONE" >> "$LOG"
