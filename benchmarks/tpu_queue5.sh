#!/bin/bash
# Relaunch of queue 4 (which died with its session before running anything):
# re-measure the north star + bench + config-3 voxel + fidelity with the
# Pallas-prep default. Sole TPU user while active.
set -u
cd /root/repo
LOG=/tmp/tpu_queue5.log
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

say "queue 5 starting"
wait_tunnel
say "=== 1/4 north-star proxy (2^27, coherent, pallas prep default) ==="
timeout 5400 python benchmarks/northstar_proxy.py --engine coherent \
  --out /tmp/NORTHSTAR_r3b.json >> "$LOG" 2>&1 \
  && say "northstar done" || say "northstar FAILED"

wait_tunnel
say "=== 2/4 bench.py ==="
timeout 3600 python bench.py >> "$LOG" 2>&1 \
  && say "bench done" || say "bench FAILED"

wait_tunnel
say "=== 3/4 voxel3d (config-3 class) ==="
timeout 3600 python benchmarks/voxel3d_bench.py >> "$LOG" 2>&1 \
  && say "voxel3d done" || say "voxel3d FAILED"

wait_tunnel
say "=== 4/4 fidelity ==="
timeout 5400 python benchmarks/fidelity_check.py >> "$LOG" 2>&1 \
  && say "fidelity done" || say "fidelity FAILED"

say "queue 5 complete"
