#!/usr/bin/env bash
# Round-5 continuation TPU queue (fresh container: artifacts/aot is empty,
# so step 1 re-warms every fused phase graph via remote compile AND
# produces the headline bench). One TPU client at a time; steps run to
# completion (never kill a TPU process mid-RPC — see .claude/skills/verify).
# A soft deadline stops STARTING new steps after DEADLINE_S seconds so the
# queue drains before the round's driver bench.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs results
START=$(date +%s)
DEADLINE_S="${DEADLINE_S:-2400}"

step() {
  now=$(date +%s); el=$((now-START))
  if [ "$el" -gt "$DEADLINE_S" ]; then
    echo "[queue] skip (deadline ${el}s>${DEADLINE_S}s): $*"
    return 0
  fi
  echo "[queue] ==== $* at $(date +%H:%M:%S) (t+${el}s) ===="
  "$@"
  echo "[queue] ---- rc=$? at $(date +%H:%M:%S)"
}

step env WH2_TRACE=1 python bench.py
step python bench_es256.py
step python bench_sweep.py 13
step python bench_sweep.py 12
step python bench_sweep.py 11
step python bench_sweep.py 18
echo "[queue] all done at $(date +%H:%M:%S)"
