#!/bin/bash
# Round-4 extra bench configs (run after the batch sweep):
# - zstrided + subpixel_folded TOGETHER: each lost ~2% alone (PLAN.md), but
#   combined they remove ALL 5D stage-boundary round-trips (encoder stride-2
#   heads AND decoder upsamples) — the data-formatting tail may be
#   super-additive (VERDICT r3 ask #2b).
# - ATK_ZCOMBINE=conv at model scale: the selection-kernel tap combine was
#   pre-wired round 3 and probed only in isolation.
set -u
cd /root/repo
LOG=/tmp/batch_sweep_r4.log
while ! grep -q "SWEEP DONE" "$LOG" 2>/dev/null; do sleep 30; done
run() {
  desc="$1"; shift
  echo "=== $desc [$(date +%H:%M:%S)]" >> "$LOG"
  env "$@" timeout 3600 python bench.py >> "$LOG" 2>&1
  echo "--- exit=$? [$(date +%H:%M:%S)]" >> "$LOG"
}
run "bs4 zstrided + subpixel_folded (all-folded stage boundaries)" \
    ATK_ZSTRIDED=1 ATK_CONVT421_LOWERING=subpixel_folded
run "bs4 zcombine=conv" ATK_ZCOMBINE=conv
echo "SWEEP2 DONE" >> "$LOG"
