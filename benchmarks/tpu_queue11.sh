#!/bin/bash
# Waits for tpu_queue10 to finish, then runs the ion-physics production
# bench and the warm-start serialize_executable probe.
set -u
cd /root/repo
LOG=/tmp/tpu_queue11.log
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
Q10=$(cat /tmp/q10.pid 2>/dev/null || echo 0)
while [ "$Q10" != 0 ] && kill -0 "$Q10" 2>/dev/null; do sleep 60; done
say "queue10 finished; probing tunnel"
OK=0
for i in $(seq 1 100); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(4).sum()))" >/dev/null 2>&1; then
    say "tunnel OK"; OK=1; break
  fi
  say "probe $i wedged"; sleep 280
done
[ "$OK" = 1 ] || { say "tunnel never recovered"; exit 1; }

say "=== northstar shear retry (size-class buckets) ==="
timeout 5400 python benchmarks/northstar_proxy.py --order random --engine sorted \
  --layout shear --out NORTHSTAR_SHEAR.json >> "$LOG" 2>&1 \
  && say "shear done" || say "shear FAILED"

say "=== ion e2e 2^24 ==="
timeout 4200 python benchmarks/ion_e2e.py --n $((1<<24)) >> "$LOG" 2>&1 \
  && say "ion 2^24 done" || say "ion FAILED"
say "=== ion e2e 2^26 ==="
timeout 4200 python benchmarks/ion_e2e.py --n $((1<<26)) --out ION_E2E_64M.json >> "$LOG" 2>&1 \
  && say "ion 2^26 done" || say "ion 2^26 FAILED"

say "=== warmstart probe: save / load / jit (fresh processes) ==="
rm -f /root/repo/WARMSTART.json /tmp/ast_exe.bin
timeout 3000 python benchmarks/warmstart_probe.py save >> "$LOG" 2>&1 && say "save done" || say "save FAILED"
timeout 3000 python benchmarks/warmstart_probe.py load >> "$LOG" 2>&1 && say "load done" || say "load FAILED"
timeout 3000 python benchmarks/warmstart_probe.py jit >> "$LOG" 2>&1 && say "jit done" || say "jit FAILED"
say "queue11 complete"
