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
say "=== shear layout, random order 2^27 (memory-lean stage A) ==="
timeout 5400 python benchmarks/northstar_proxy.py --order random --engine sorted \
  --layout shear --out NORTHSTAR_SHEAR.json >> "$LOG" 2>&1 \
  && say "shear done" || say "shear FAILED"
say "queue complete"
