#!/bin/bash
# Round-4 throughput lever sweep (VERDICT ask #2a/#2b): per-chip batch 8/16
# via remat or lax.scan grad-accum (exact semantics: every pretrain norm is
# per-sample), and the input-side z-concat revisited under microbatching
# (it OOMed only at bs-4 noremat; per-microbatch bs 2-4 halves the peak).
# Runs bench.py once per config, sequentially (ONE axon client at a time).
set -u
cd /root/repo
LOG=/tmp/batch_sweep_r4.log
: > "$LOG"
run() {
  desc="$1"; shift
  echo "=== $desc [$(date +%H:%M:%S)]" >> "$LOG"
  env "$@" timeout 3600 python bench.py >> "$LOG" 2>&1
  echo "--- exit=$? [$(date +%H:%M:%S)]" >> "$LOG"
}
run "bs4 micro1 noremat (shipped default, session baseline)"
run "bs8 micro2 scan noremat (per-conv bs4, amortized opt/EMA)" \
    ATK_BENCH_BATCH=8 ATK_BENCH_MICRO=2
run "bs8 micro1 remat (per-conv bs8: MXU efficiency probe)" \
    ATK_BENCH_BATCH=8 ATK_BENCH_MICRO=1 ATK_BENCH_REMAT=1
run "bs4 micro2 scan + input-side zconcat" \
    ATK_BENCH_BATCH=4 ATK_BENCH_MICRO=2 ATK_ZCONCAT_SIDE=input
run "bs16 micro2 scan remat (per-conv bs8)" \
    ATK_BENCH_BATCH=16 ATK_BENCH_MICRO=2 ATK_BENCH_REMAT=1
echo "SWEEP DONE" >> "$LOG"
