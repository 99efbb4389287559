#!/bin/bash
# Round-5 queue: shear-layout random-order measurement (VERDICT item 1).
# Waits for tunnel recovery; never run two TPU processes at once.
set -u
cd /root/repo
LOG=/tmp/tpu_queue9.log
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

say "waiting for tunnel..."
OK=0
for i in $(seq 1 200); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(4).sum()))" >/dev/null 2>&1; then
    say "tunnel OK (probe $i)"
    OK=1
    break
  fi
  say "probe $i wedged"
  sleep 280
done
[ "$OK" = 1 ] || { say "tunnel never recovered"; exit 1; }

say "=== 1/2 shear layout, random order 2^27 ==="
timeout 5400 python benchmarks/northstar_proxy.py --order random --engine sorted \
  --layout shear --out NORTHSTAR_SHEAR.json >> "$LOG" 2>&1 \
  && say "shear done" || say "shear FAILED"

say "=== 2/2 sort layout baseline refresh, random order 2^27 ==="
timeout 5400 python benchmarks/northstar_proxy.py --order random --engine sorted \
  --layout sort --out NORTHSTAR_RANDOM.json >> "$LOG" 2>&1 \
  && say "sort baseline done" || say "sort baseline FAILED"
say "queue complete"
