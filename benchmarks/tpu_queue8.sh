#!/bin/bash
# Session-4 TPU measurement queue: precision A/B, voxel3d re-measure (the
# SMEM-adapted geometry from 26ffffe never got its hardware number), and
# the fused engine with tight calibrated caps. Waits for tunnel recovery;
# never run two TPU processes at once.
set -u
cd /root/repo
LOG=/tmp/tpu_queue8.log
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

say "=== 1/3 precision A/B (2^26) ==="
timeout 5400 python benchmarks/precision_ab.py --n $((1<<26)) >> "$LOG" 2>&1 \
  && say "precision_ab done" || say "precision_ab FAILED"

say "=== 2/3 voxel3d (config-3 class, SMEM-adapted geometry) ==="
timeout 5400 python benchmarks/voxel3d_bench.py >> "$LOG" 2>&1 \
  && say "voxel3d done" || say "voxel3d FAILED"

say "=== 3/3 north-star fused, tight caps (slack 1.05) ==="
timeout 5400 python benchmarks/northstar_proxy.py --engine coherent-fused \
  --caps-slack 1.05 --out /root/repo/NORTHSTAR_FUSED_TIGHT.json >> "$LOG" 2>&1 \
  && say "fused tight done" || say "fused tight FAILED"

say "queue complete"
