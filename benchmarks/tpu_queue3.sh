#!/bin/bash
# Round-3 continuation TPU measurement queue. Sole TPU user while active.
set -u
cd /root/repo
LOG=/tmp/tpu_queue3.log
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(4).sum()))" >/dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 120); do
    if probe; then say "tunnel OK (probe $i)"; return 0; fi
    say "probe $i wedged"; sleep 280
  done
  return 1
}

wait_tunnel || { say "tunnel never recovered"; exit 1; }

say "=== 1/3 prep A/B (2^26) ==="
timeout 3600 python benchmarks/prep_ab.py --n $((1<<26)) >> "$LOG" 2>&1 \
  && say "prep_ab done" || say "prep_ab FAILED"

wait_tunnel
say "=== 2/3 window A/B (2^26) ==="
timeout 5400 python benchmarks/window_ab.py --n $((1<<26)) >> "$LOG" 2>&1 \
  && say "window_ab done" || say "window_ab FAILED"

wait_tunnel
say "=== 3/3 north-star proxy (2^27, coherent-fused zero-sync) ==="
timeout 5400 python benchmarks/northstar_proxy.py --engine coherent-fused \
  --out /tmp/NORTHSTAR_fused.json >> "$LOG" 2>&1 \
  && say "northstar fused done" || say "northstar fused FAILED"

say "queue 3 complete"
