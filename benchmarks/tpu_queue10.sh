#!/bin/bash
set -u
cd /root/repo
LOG=/tmp/tpu_queue10.log
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
say "waiting for tunnel..."
OK=0
for i in $(seq 1 200); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(4).sum()))" >/dev/null 2>&1; then
    say "tunnel OK (probe $i)"; OK=1; break
  fi
  say "probe $i wedged"; sleep 280
done
[ "$OK" = 1 ] || { say "tunnel never recovered"; exit 1; }

say "=== 1/3 shear layout, random order 2^27 (memory-lean stage A) ==="
timeout 5400 python benchmarks/northstar_proxy.py --order random --engine sorted \
  --layout shear --out NORTHSTAR_SHEAR.json >> "$LOG" 2>&1 \
  && say "shear done" || say "shear FAILED"

say "=== 2/3 e2e packdelta wire 2^27 ==="
timeout 5400 python benchmarks/e2e_1e8.py 27 8 packdelta 1 > /tmp/e2e_packdelta.log 2>&1 \
  && say "e2e packdelta done" || say "e2e packdelta FAILED"
tail -1 /tmp/e2e_packdelta.log >> "$LOG"

say "=== 3/3 e2e packraw baseline 2^27 (same tunnel state) ==="
timeout 5400 python benchmarks/e2e_1e8.py 27 8 packraw 1 > /tmp/e2e_packraw.log 2>&1 \
  && say "e2e packraw done" || say "e2e packraw FAILED"
tail -1 /tmp/e2e_packraw.log >> "$LOG"
say "queue complete"
