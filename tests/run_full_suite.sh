#!/usr/bin/env bash
# Full-suite runner: fast lane in one process, then each slow-marked file in
# its OWN pytest process.
#
# Why: XLA-CPU's backend_compile_and_load segfaults nondeterministically on
# large compiles late in a long-lived process (observed five times across
# single-process `pytest --slow` runs, each time in whichever heavy compile
# came after a few hundred accumulated compilations — cache read, cache
# write, and raw compile stacks alike). Short-lived processes never hit it.
# Process-per-file bounds the compile count per interpreter and localises
# any future fault to one file's report instead of killing the whole run.
#
# Usage: bash tests/run_full_suite.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."

rc=0

# never forward --slow into the single-process fast lane: that would run
# the whole slow lane in one long-lived process — the exact crash mode
# this script exists to avoid
fast_args=()
for a in "$@"; do
    [ "$a" = "--slow" ] || fast_args+=("$a")
done

echo "=== fast lane (single process) ==="
python -m pytest tests/ -q -p no:cacheprovider ${fast_args[@]+"${fast_args[@]}"} || rc=1

slow_files=$(grep -l "^pytestmark = pytest.mark.slow" tests/test_*.py)
for f in $slow_files; do
    echo "=== slow: $f (own process) ==="
    python -m pytest "$f" -q --slow -p no:cacheprovider "$@" || rc=1
done

echo "=== multi-process lane (2x jax.distributed CPU processes) ==="
bash tests/multiprocess/run_multiprocess.sh 2 || rc=1

if [ "$rc" -eq 0 ]; then
    echo "FULL SUITE: all lanes green"
else
    echo "FULL SUITE: FAILURES (see above)" >&2
fi
exit $rc
