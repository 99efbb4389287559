#!/bin/bash
# Run the round-3 TPU measurement queue once the axon tunnel recovers.
# Each step is watchdogged; progress to /tmp/tpu_queue.log. Never run two
# TPU processes at once — this script is the only TPU user while active.
set -u
cd /root/repo
LOG=/tmp/tpu_queue.log
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

say "waiting for tunnel..."
for i in $(seq 1 200); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(4).sum()))" >/dev/null 2>&1; then
    say "tunnel OK (probe $i)"
    break
  fi
  say "probe $i wedged"
  sleep 280
done

say "=== 1/5 prep A/B (2^26) ==="
timeout 2400 python benchmarks/prep_ab.py --n $((1<<26)) >> "$LOG" 2>&1 \
  && say "prep_ab done" || say "prep_ab FAILED"

say "=== 2/5 coherent profile (2^26) ==="
timeout 2400 python benchmarks/coherent_profile.py --n $((1<<26)) >> "$LOG" 2>&1 \
  && say "profile done" || say "profile FAILED"

say "=== 3/5 north-star proxy (2^27, coherent) ==="
timeout 3600 python benchmarks/northstar_proxy.py --engine coherent >> "$LOG" 2>&1 \
  && say "northstar done" || say "northstar FAILED"

say "=== 3b/5 north-star proxy (2^27, coherent-fused zero-sync) ==="
timeout 3600 python benchmarks/northstar_proxy.py --engine coherent-fused \
  --out /tmp/NORTHSTAR_fused.json >> "$LOG" 2>&1 \
  && say "northstar fused done" || say "northstar fused FAILED"

say "=== 4/5 bench.py ==="
timeout 3600 python bench.py >> "$LOG" 2>&1 \
  && say "bench done" || say "bench FAILED"

say "=== 5/5 fidelity ==="
timeout 3600 python benchmarks/fidelity_check.py >> "$LOG" 2>&1 \
  && say "fidelity done" || say "fidelity FAILED"

say "queue complete"
