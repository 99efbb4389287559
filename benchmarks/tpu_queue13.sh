#!/bin/bash
# Fidelity re-stamp (round-5 engines: shear layout, Voigt pallas, MXU interp)
set -u
cd /root/repo
LOG=/tmp/tpu_queue13.log
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
Q=$(cat /tmp/q12.pid 2>/dev/null || echo 0)
while [ "$Q" != 0 ] && kill -0 "$Q" 2>/dev/null; do sleep 60; done
say "queue12 finished; probing tunnel"
OK=0
for i in $(seq 1 100); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(4).sum()))" >/dev/null 2>&1; then
    say "tunnel OK"; OK=1; break
  fi
  say "probe $i wedged"; sleep 280
done
[ "$OK" = 1 ] || { say "tunnel never recovered"; exit 1; }
say "=== fidelity re-stamp ==="
timeout 5400 python benchmarks/fidelity_check.py >> "$LOG" 2>&1 \
  && say "fidelity done" || say "fidelity FAILED"
say "queue13 complete"
