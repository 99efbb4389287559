#!/bin/bash
# True multi-process integration check (VERDICT r4 item 3): launches N
# jax.distributed CPU processes (each with forced virtual devices) and
# drives striped reads -> global sharded assembly -> collective render ->
# cross-process consistency. Exercises the jax.process_index() > 0 paths
# that single-process virtual-device tests never reach.
#
# Usage: bash tests/multiprocess/run_multiprocess.sh [NUM_PROCESSES]
set -u
NP=${1:-2}
HERE=$(cd "$(dirname "$0")" && pwd)
REPO=$(cd "$HERE/../.." && pwd)
DATA=$(mktemp -d /tmp/ast_mp_XXXX)
PORT=$(( (RANDOM % 2000) + 45000 ))
trap 'rm -rf "$DATA"' EXIT

# fixture: a 4-file synthetic EAGLE snapshot (written single-process)
PYTHONPATH= JAX_PLATFORMS=cpu python - "$DATA" <<'EOF' || exit 1
import sys
sys.path.insert(0, "/root/repo")
from astro_sph_tools_tpu.io.synthetic import SyntheticSnapshotSpec, write_snapshot

spec = SyntheticSnapshotSpec(n_gas=6000, n_dm=500, n_star=64, n_bh=2,
                             n_files=4, seed=11)
path, _ = write_snapshot(sys.argv[1], spec)
with open(sys.argv[1] + "/path.txt", "w") as f:
    f.write(path)
print("fixture written:", path)
EOF

PIDS=()
RC=0
for ((i = 0; i < NP; i++)); do
  PYTHONPATH= python "$HERE/worker.py" \
    --process-id "$i" --num-processes "$NP" \
    --coordinator "127.0.0.1:$PORT" --data-dir "$DATA" \
    > "/tmp/ast_mp_worker_$i.log" 2>&1 &
  PIDS+=($!)
done
for ((i = 0; i < NP; i++)); do
  if ! wait "${PIDS[$i]}"; then
    RC=1
    echo "worker $i FAILED:"
    tail -20 "/tmp/ast_mp_worker_$i.log"
  else
    grep "OK:" "/tmp/ast_mp_worker_$i.log"
  fi
done
if [ "$RC" = 0 ]; then
  echo "multiprocess check PASSED ($NP processes)"
else
  echo "multiprocess check FAILED"
fi
exit $RC
