#!/bin/bash
# Follow-up TPU measurement queue (window-schedule A/B). Waits for the
# round-3 queue (tpu_queue.sh -> /tmp/tpu_queue.log) to finish first, then
# runs the window A/B and re-measures the north star with the winner.
set -u
cd /root/repo
LOG=/tmp/tpu_queue2.log
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

say "waiting for queue 1 to complete..."
DONE=0
for i in $(seq 1 400); do
  if grep -q "queue complete" /tmp/tpu_queue.log 2>/dev/null; then
    say "queue 1 complete"
    DONE=1
    break
  fi
  sleep 120
done
if [ "$DONE" != 1 ]; then
  # never start a second TPU process while queue 1 may still hold the chip
  say "queue 1 did not complete within the wait budget; aborting queue 2"
  exit 1
fi

say "=== 1/3 window A/B (2^26) ==="
timeout 3600 python benchmarks/window_ab.py --n $((1<<26)) >> "$LOG" 2>&1 \
  && say "window_ab done" || say "window_ab FAILED"

BEST=$(python - <<'PY'
import json
try:
    r = json.load(open("/root/repo/WINDOW_AB.json"))
    best = min(r["cases"].items(), key=lambda kv: kv[1]["total_s"])
    print(best[0].split("=")[1])
except Exception:
    print(0)
PY
)
say "best window: $BEST"

say "=== 2/3 north-star proxy (2^27, coherent, window=$BEST) ==="
timeout 3600 python benchmarks/northstar_proxy.py --engine coherent \
  --window "$BEST" --out /tmp/NORTHSTAR_window.json >> "$LOG" 2>&1 \
  && say "northstar window done" || say "northstar window FAILED"

say "=== 3/3 bench.py (if window default was flipped) ==="
timeout 3600 python bench.py >> "$LOG" 2>&1 \
  && say "bench done" || say "bench FAILED"

say "queue 2 complete"
