#!/bin/bash
# CI suite runner resilient to this container's flaky XLA:CPU backend.
#
# XLA:CPU intermittently dies (SIGSEGV/SIGABRT inside backend_compile)
# while compiling the prover's montmul-heavy graphs — position varies run
# to run; raised stack limits, single-split codegen, and O0 all reduce
# but do not eliminate it (see tests/conftest.py). State is never
# corrupted: a clean re-run of the same tests passes. This script runs
# each test file in its own pytest process and retries crashed files
# (rc >= 128) up to twice, which makes the suite deterministic in
# practice.
#
# Usage: scripts/run_suite.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
export PALLAS_AXON_POOL_IPS=   # CPU-only: skip the axon plugin handshake
export JAX_PLATFORMS=cpu

fail=0
for f in tests/test_*.py; do
    for attempt in 1 2 3; do
        python -m pytest "$f" -q -m "not slow" "$@"
        rc=$?
        if [ $rc -eq 0 ] || [ $rc -eq 5 ]; then  # 5 = no tests selected
            break
        fi
        if [ $rc -lt 128 ]; then  # real test failure: do not retry
            echo "FAIL $f (rc=$rc)"
            fail=1
            break
        fi
        echo "RETRY $f after backend crash (rc=$rc, attempt $attempt)"
        if [ $attempt -eq 3 ]; then
            echo "FAIL $f (crashed 3x)"
            fail=1
        fi
    done
done
exit $fail
