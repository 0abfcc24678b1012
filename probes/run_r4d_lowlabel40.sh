#!/bin/bash
# Round-4d: run the label-efficiency arms to convergence — FRESH 40-epoch
# runs with a clean poly-LR schedule (not a resume of the 20-epoch arms,
# whose LR had already decayed to ~0) so the converged-Dice comparison can't
# be attributed to an under-trained scratch arm. The 20-epoch records are
# preserved under *_ep20 keys. One process per arm (axon H2D leak, CLAUDE.md);
# waits for any process currently holding the TPU (checked by caller).
set -u
cd /root/repo
LOG=/tmp/r4d_lowlabel40.log
: > "$LOG"
python - <<'EOF' >> "$LOG" 2>&1
import json, shutil
p = "/tmp/acc/res/ft_results_956.json"
r = json.load(open(p))
for t in ("scratch_low3", "pretrained_low3"):
    if t in r and f"{t}_ep20" not in r:
        r[f"{t}_ep20"] = r.pop(t)
    r.pop(t, None)
    shutil.rmtree(
        f"/tmp/acc/res/Dataset956_AccHard/STUNetTrainer_base_{t}__ATKPlans__ft96",
        ignore_errors=True)
json.dump(r, open(p, "w"))
print("prepared: arms reset, ep20 records preserved:", sorted(r))
EOF
for arm in scratch_low3 pretrained_low3; do
  tries=0
  while [ $tries -lt 3 ]; do
    tries=$((tries + 1))
    echo "=== arm $arm (40ep) try $tries [$(date +%H:%M:%S)]" >> "$LOG"
    timeout 10800 env ACC_HARD=1 ACC_PRETRAIN_EPOCHS=50 ACC_ITERS=100 \
      ACC_FT_EPOCHS=40 ACC_FT_EPOCHS_SCRATCH=40 ACC_SAVE_EVERY=10 \
      ACC_RESUME=1 ACC_LOWLABEL_ARMS=1 ACC_ARMS="$arm" \
      python probes/accuracy_loop.py >> "$LOG" 2>&1
    rc=$?
    echo "--- arm $arm exit=$rc [$(date +%H:%M:%S)]" >> "$LOG"
    [ $rc -eq 0 ] && break
    sleep 60
  done
done
echo "R4D DONE [$(date +%H:%M:%S)]" >> "$LOG"
