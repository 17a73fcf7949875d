#!/usr/bin/env bash
# Round-5 TPU job queue: serializes one-chip work (the tunneled backend
# must never see two client processes at once — see .claude/skills/verify).
# Waits for any currently-running TPU pid given as $1, then runs the
# remaining sweep rows (k=14..11), the k=18/19 rows that previously hit
# the compile-relay body cap (uint8 graph constants shrink them 4x), and
# finally the headline bench. No per-step timeouts: a SIGTERM mid-RPC
# wedges the relay's D2H path for an hour (worse than any slow step).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs results

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "[queue] waiting for pid $WAIT_PID to finish..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "[queue] pid $WAIT_PID done at $(date +%H:%M:%S)"
fi

step() {
  echo "[queue] ==== $* at $(date +%H:%M:%S) ===="
  "$@"
  echo "[queue] ---- rc=$? at $(date +%H:%M:%S)"
}

step python bench_sweep.py 14
step python bench_sweep.py 18
step python bench_sweep.py 13
step python bench_sweep.py 12
step python bench_sweep.py 11
step python bench_sweep.py 19
WH2_TRACE=1 step python bench.py
echo "[queue] all done at $(date +%H:%M:%S)"
