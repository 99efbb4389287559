#!/bin/bash
# Clean re-runs (the first v2 e2e pair was contaminated by concurrent host
# work) + the bucketed random-order northstar.
set -u
cd /root/repo
LOG=/tmp/tpu_queue14.log
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
Q=$(cat /tmp/q13.pid 2>/dev/null || echo 0)
while [ "$Q" != 0 ] && kill -0 "$Q" 2>/dev/null; do sleep 60; done
say "queue13 finished; probing tunnel"
OK=0
for i in $(seq 1 100); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(4).sum()))" >/dev/null 2>&1; then
    say "tunnel OK"; OK=1; break
  fi
  say "probe $i wedged"; sleep 280
done
[ "$OK" = 1 ] || { say "tunnel never recovered"; exit 1; }

say "=== northstar bucketed (coarse shear -> coherent), random 2^27 ==="
timeout 5400 python benchmarks/northstar_proxy.py --order random --engine bucketed \
  --out NORTHSTAR_BUCKETED.json >> "$LOG" 2>&1 \
  && say "bucketed done" || say "bucketed FAILED"

say "=== e2e v2 packraw (clean) ==="
timeout 5400 python benchmarks/e2e_1e8.py 27 8 packraw 1 > /tmp/e2e_v2_packraw2.log 2>&1 \
  && say done || say FAILED
tail -1 /tmp/e2e_v2_packraw2.log >> "$LOG"
say "=== e2e v2 packdelta (clean) ==="
timeout 5400 python benchmarks/e2e_1e8.py 27 8 packdelta 1 > /tmp/e2e_v2_packdelta2.log 2>&1 \
  && say done || say FAILED
tail -1 /tmp/e2e_v2_packdelta2.log >> "$LOG"
say "queue14 complete"
