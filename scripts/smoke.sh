#!/usr/bin/env bash
# Smoke tier (<5 min target on 2 CPUs): the compile-light test files —
# host math, transcripts, native libs, EVM machine/chain, client codec.
# The heavy compile-bound files (plonk_e2e, evm_codegen, circuits,
# sharding, es256, pallas kernels) run in the full suite
# (scripts/run_suite.sh), which is the CI record.
set -e
cd "$(dirname "$0")/.."
exec python -m pytest -q \
  tests/test_ref_math.py \
  tests/test_native_pairing.py \
  tests/test_transcript.py \
  tests/test_sha256.py \
  tests/test_webauthn_client.py \
  tests/test_chain_e2e.py \
  "$@"
