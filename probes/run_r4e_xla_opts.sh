#!/bin/bash
# Round-4e: XLA compiler-option sweep on the headline bench — scoped-VMEM
# limit is the one classic single-chip lever not yet tried (larger scoped
# VMEM can admit bigger conv fusions; v5e has 128 MiB VMEM total). Each
# variant is a fresh remote compile (~5-20 min). One process at a time;
# waits for the r4d accuracy queue to release the TPU.
set -u
cd /root/repo
LOG=/tmp/r4e_xla_opts.log
: > "$LOG"
echo "waiting for r4d queue [$(date +%H:%M:%S)]" >> "$LOG"
while ! grep -q "R4D DONE" /tmp/r4d_lowlabel40.log 2>/dev/null; do
  sleep 30
done
for kib in 32768 65536 98304; do
  echo "=== scoped_vmem_limit_kib=$kib [$(date +%H:%M:%S)]" >> "$LOG"
  timeout 3600 env \
    ATK_BENCH_COMPILER_OPTS="{\"xla_tpu_scoped_vmem_limit_kib\": $kib}" \
    python bench.py >> "$LOG" 2>&1
  echo "--- exit=$? [$(date +%H:%M:%S)]" >> "$LOG"
done
echo "=== default (control rerun) [$(date +%H:%M:%S)]" >> "$LOG"
timeout 3600 python bench.py >> "$LOG" 2>&1
echo "R4E DONE [$(date +%H:%M:%S)]" >> "$LOG"
