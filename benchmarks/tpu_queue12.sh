#!/bin/bash
# v2 (PH-ordered) e2e fixture: packraw vs packdelta wire A/B at 2^27,
# plus a readers=2 record (1-core host: expected flat; records the knob).
set -u
cd /root/repo
LOG=/tmp/tpu_queue12.log
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
say "probing tunnel"
OK=0
for i in $(seq 1 100); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(4).sum()))" >/dev/null 2>&1; then
    say "tunnel OK"; OK=1; break
  fi
  say "probe $i wedged"; sleep 280
done
[ "$OK" = 1 ] || { say "tunnel never recovered"; exit 1; }

say "=== northstar shear attempt 3 (split stage B) ==="
ASTSPH_SHEAR_PROFILE=1 timeout 5400 python benchmarks/northstar_proxy.py --order random --engine sorted \
  --layout shear --out NORTHSTAR_SHEAR.json >> "$LOG" 2>&1 \
  && say "shear done" || say "shear FAILED"

say "=== e2e v2 packraw 2^27 ==="
timeout 5400 python benchmarks/e2e_1e8.py 27 8 packraw 1 > /tmp/e2e_v2_packraw.log 2>&1 \
  && say done || say FAILED
tail -1 /tmp/e2e_v2_packraw.log >> "$LOG"
say "=== e2e v2 packdelta 2^27 ==="
timeout 5400 python benchmarks/e2e_1e8.py 27 8 packdelta 1 > /tmp/e2e_v2_packdelta.log 2>&1 \
  && say done || say FAILED
tail -1 /tmp/e2e_v2_packdelta.log >> "$LOG"
say "=== e2e v2 packdelta readers=2 ==="
timeout 5400 python benchmarks/e2e_1e8.py 27 8 packdelta 2 > /tmp/e2e_v2_packdelta_r2.log 2>&1 \
  && say done || say FAILED
tail -1 /tmp/e2e_v2_packdelta_r2.log >> "$LOG"

say "=== e2e v2 packdelta + coherent engine ==="
timeout 5400 python benchmarks/e2e_1e8.py 27 8 packdelta 1 coherent > /tmp/e2e_v2_coh.log 2>&1 \
  && say done || say FAILED
tail -1 /tmp/e2e_v2_coh.log >> "$LOG"

say "=== ion e2e re-measure (MXU interp) 2^26 ==="
timeout 4200 python benchmarks/ion_e2e.py --n $((1<<26)) --out ION_E2E_64M.json >> "$LOG" 2>&1 \
  && say done || say FAILED
timeout 4200 python benchmarks/ion_e2e.py --n $((1<<24)) >> "$LOG" 2>&1 \
  && say done || say FAILED
say "queue12 complete"
