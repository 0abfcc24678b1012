#!/bin/bash
# Round-4 TPU artifact queue (VERDICT asks #6 + #7). Waits for the batch
# sweep to finish (ONE axon process at a time — overlapping clients wedge the
# tunnel, CLAUDE.md), then runs serially:
#   1. session bandwidth probe (context for any e2e number)
#   2. bench_inference.py -> BENCH_inference_r04.json
#   3. supervised 5-epoch benchmark pair -> BENCH_supervised_r04.json
#   4. hard-task accuracy loop (50-epoch pretrain + scratch/pretrained arms)
set -u
cd /root/repo
LOG=/tmp/r4_queue.log
: > "$LOG"
echo "waiting for sweeps to finish [$(date +%H:%M:%S)]" >> "$LOG"
while ! grep -q "SWEEP2 DONE" /tmp/batch_sweep_r4.log 2>/dev/null; do
  sleep 30
done
echo "sweep done, starting queue [$(date +%H:%M:%S)]" >> "$LOG"

step() {
  echo "=== $1 [$(date +%H:%M:%S)]" >> "$LOG"
  shift
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- exit=$? [$(date +%H:%M:%S)]" >> "$LOG"
}

step "bandwidth" 600 python probes/probe_bandwidth.py
echo "=== inference bench [$(date +%H:%M:%S)]" >> "$LOG"
timeout 3600 python bench_inference.py > /tmp/bench_inf_r04.out 2>> "$LOG"
echo "--- exit=$? [$(date +%H:%M:%S)]" >> "$LOG"
python - <<'EOF' >> "$LOG" 2>&1
import json
inf = json.loads(open("/tmp/bench_inf_r04.out").read().strip().splitlines()[-1])
try:
    bw = json.load(open("probes/bandwidth_result.json"))
except Exception:
    bw = None
out = {"inference": inf, "session_tunnel_bandwidth": bw,
       "note": "volumes_per_sec_device is the cross-session-comparable metric; "
               "volumes_per_sec_e2e includes this session's host tunnel "
               "(25 MB/s-0.5 GB/s between sessions; production hosts use "
               "~GB/s DMA)"}
json.dump(out, open("BENCH_inference_r04.json", "w"), indent=1)
print("BENCH_inference_r04.json written:", json.dumps(inf))
EOF
step "supervised benchmark" 7200 python probes/run_supervised_benchmark.py
step "hard accuracy loop" 21600 env ACC_HARD=1 ACC_PRETRAIN_EPOCHS=50 \
    ACC_ITERS=100 ACC_FT_EPOCHS=20 ACC_FT_EPOCHS_SCRATCH=40 \
    ACC_SAVE_EVERY=10 ACC_RESUME=1 python probes/accuracy_loop.py
echo "QUEUE DONE [$(date +%H:%M:%S)]" >> "$LOG"
