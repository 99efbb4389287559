#!/bin/bash
# Queue 7: coherent-engine profile re-run (the committed COHERENT_PROFILE.json
# predates the deposit-phase split + Pallas-prep default). The deposit split
# (coherent pass vs tail pipeline vs overlap-add) decides the next kernel
# attack (ROADMAP seam #1). Waits for queue 6; sole TPU user while active.
set -u
cd /root/repo
LOG=/tmp/tpu_queue7.log
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

say "queue 7 starting; waiting for queue 6"
if [ -f /tmp/queue6.pid ]; then
  while kill -0 "$(cat /tmp/queue6.pid)" 2>/dev/null; do sleep 60; done
fi
say "queue 6 gone"

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
say "=== 1/1 coherent profile (2^26, deposit split) ==="
timeout 7200 python benchmarks/coherent_profile.py >> "$LOG" 2>&1 \
  && say "profile done" || say "profile FAILED"

say "queue 7 complete"
