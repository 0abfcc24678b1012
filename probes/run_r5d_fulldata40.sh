#!/bin/bash
# Round-5d (bonus, time-guarded): full-data pretrained arm at the SAME
# 40-epoch budget as scratch, so the "full-data null result" comparison is
# matched-epoch, not just matched-wall-clock (the committed record compares
# scratch@40ep with pretrained@20ep). The 20-epoch record is preserved under
# pretrained_ep20 in the committed evidence file (r4d rename pattern).
# Skips entirely if it can't start by the cutoff — the driver's end-of-round
# bench.py must find the chip free (CLAUDE.md: concurrent axon processes can
# wedge the tunnel).
set -u
cd /root/repo
LOG=/tmp/r5d_fulldata40.log
: > "$LOG"
CUTOFF=1340  # HHMM local; arm takes ~45-60 min, bounded by timeout below
echo "waiting for r5c [$(date +%H:%M:%S)]" >> "$LOG"
while ! grep -q "R5C DONE" /tmp/r5c_seed3.log 2>/dev/null; do sleep 60; done
now=$(date +%H%M)
if [ "$now" -ge "$CUTOFF" ]; then
  echo "SKIPPED: past cutoff ($now >= $CUTOFF)" >> "$LOG"
  echo "R5D DONE [$(date +%H:%M:%S)]" >> "$LOG"
  exit 0
fi
python - <<'EOF' >> "$LOG" 2>&1
import json, shutil
# preserve the 20-epoch full-data record in the COMMITTED evidence file so
# the merge-on-finish doesn't overwrite it
p = "probes/accuracy_loop_hard_result.json"
r = json.load(open(p))
ft = r["finetune"]
if "pretrained" in ft and ft["pretrained"].get("num_epochs") == 20 \
        and "pretrained_ep20" not in ft:
    ft["pretrained_ep20"] = ft.pop("pretrained")
    json.dump(r, open(p, "w"), indent=1)
    print("committed file: pretrained -> pretrained_ep20")
# and in the /tmp partial (present only if this round already ran the tag)
p2 = "/tmp/acc/res/ft_results_956.json"
try:
    r2 = json.load(open(p2))
except FileNotFoundError:
    r2 = None
if r2 is not None and "pretrained" in r2:
    if r2["pretrained"].get("num_epochs") == 20 and "pretrained_ep20" not in r2:
        r2["pretrained_ep20"] = r2.pop("pretrained")
    else:
        r2.pop("pretrained", None)
    json.dump(r2, open(p2, "w"))
    print("partial file: pretrained cleared/renamed")
shutil.rmtree(
    "/tmp/acc/res/Dataset956_AccHard/STUNetTrainer_base_pretrained__ATKPlans__ft96",
    ignore_errors=True)
EOF
# ONE bounded attempt only: a retry would push past the driver's
# end-of-round bench window; a timeout here just means no bonus arm
echo "=== full-data pretrained 40ep [$(date +%H:%M:%S)]" >> "$LOG"
timeout 5400 env ACC_HARD=1 ACC_PRETRAIN_EPOCHS=50 ACC_ITERS=100 \
  ACC_FT_EPOCHS=40 ACC_FT_EPOCHS_SCRATCH=40 ACC_SAVE_EVERY=10 \
  ACC_RESUME=1 ACC_ARMS=pretrained \
  python probes/accuracy_loop.py >> "$LOG" 2>&1
echo "--- exit=$? [$(date +%H:%M:%S)]" >> "$LOG"
echo "R5D DONE [$(date +%H:%M:%S)]" >> "$LOG"
