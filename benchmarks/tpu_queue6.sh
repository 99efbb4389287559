#!/bin/bash
# Queue 6: re-run the config-3 voxel bench after the SMEM adaptation fix
# (queue 5's run hit the 1 MiB SMEM wall on the K=16 level's prefetch
# tables at 512^3 — the adaptive TZ/TY chooser now bounds them).
# Waits for queue 5 to finish first; sole TPU user while active.
set -u
cd /root/repo
LOG=/tmp/tpu_queue6.log
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

say "queue 6 starting; waiting for queue 5"
if [ -f /tmp/queue5.pid ]; then
  while kill -0 "$(cat /tmp/queue5.pid)" 2>/dev/null; do sleep 60; done
fi
say "queue 5 gone"

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

wait_tunnel
say "=== 1/1 voxel3d (config-3 class, SMEM-adapted geometry) ==="
timeout 5400 python benchmarks/voxel3d_bench.py >> "$LOG" 2>&1 \
  && say "voxel3d done" || say "voxel3d FAILED"

say "queue 6 complete"
