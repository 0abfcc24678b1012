#!/bin/bash
# Round-5a: finish the scoped-VMEM XLA-flag sweep (VERDICT r4 item 1).
# The round-4 sweep (probes/run_r4e_xla_opts.sh) was still compiling its
# first variant when the round ended; caches were reset between rounds so
# every variant is a fresh remote compile (~10-40 min each). Default control
# runs FIRST so the driver's bench cache is warm even if the sweep is cut.
# One process at a time on the tunnel (CLAUDE.md).
set -u
cd /root/repo
LOG=/tmp/r5a_xla_opts.log
: > "$LOG"
echo "=== default (control, warms driver cache) [$(date +%H:%M:%S)]" >> "$LOG"
timeout 5400 python bench.py >> "$LOG" 2>&1
echo "--- exit=$? [$(date +%H:%M:%S)]" >> "$LOG"
for kib in 32768 65536 98304; do
  echo "=== scoped_vmem_limit_kib=$kib [$(date +%H:%M:%S)]" >> "$LOG"
  timeout 5400 env \
    ATK_BENCH_COMPILER_OPTS="{\"xla_tpu_scoped_vmem_limit_kib\": $kib}" \
    python bench.py >> "$LOG" 2>&1
  echo "--- exit=$? [$(date +%H:%M:%S)]" >> "$LOG"
done
echo "R5A DONE [$(date +%H:%M:%S)]" >> "$LOG"
