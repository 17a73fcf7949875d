#!/usr/bin/env python
"""Prove the full ES256/WebAuthn circuit for real (BASELINE configs 2/3).

The reference's es256.rs is disabled with `TODO: Fix SHA` (es256.rs:1,
ecc/mod.rs:2); this framework's ES256Circuit (in-circuit SHA-256 of
authenticatorData ‖ clientDataHash + P-256 ECDSA) goes through the REAL
prover here — keygen (disk-cached), create_proof on the TPU, host
verification — and prints the driver-format JSON line.

Run: timeout 3500 python bench_es256.py   (first run pays keygen +
remote phase-graph compiles; both are disk-cached for later runs)
"""
import json
import os
import secrets
import sys
import time

os.environ.setdefault(
    "WH2_SRS_DIR", os.path.join(os.path.dirname(__file__), "artifacts"))
# the 15-advice ES256 ext stack OOMs a 16 GB chip through the full-width
# quotient graph (results/ROUND5.md §4); the windowed lax.map evaluation
# is bit-identical (tests/test_quotient_chunked.py) at 1/8 the temps
os.environ.setdefault("WH2_QUOTIENT_CHUNKS", "8")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    # queue kill-switch: the session driver must find the chip idle at
    # round end; `touch logs/STOP_QUEUE` makes queued steps no-op
    if os.path.exists(os.path.join(os.path.dirname(__file__), "logs", "STOP_QUEUE")):
        print("STOP_QUEUE sentinel present; skipping", file=sys.stderr)
        return
    k = int(os.environ.get("WH2_BENCH_K", "17"))
    import hashlib

    from webauthn_halo2_tpu.circuits.es256_circuit import (
        AUTH_DATA_LEN, ES256Circuit, ES256Inputs)
    from webauthn_halo2_tpu.fields.ref_curve import ecdsa_keygen, ecdsa_sign
    from webauthn_halo2_tpu.plonk.pk_cache import keygen_cached
    from webauthn_halo2_tpu.plonk.prover import create_proof
    from webauthn_halo2_tpu.plonk.srs import get_srs
    from webauthn_halo2_tpu.plonk.verifier import verify_proof

    import jax

    log(f"devices: {jax.devices()}")

    def fresh_inputs():
        auth = secrets.token_bytes(AUTH_DATA_LEN)
        cdh = secrets.token_bytes(32)
        sk, pub = ecdsa_keygen()
        m = int.from_bytes(hashlib.sha256(auth + cdh).digest(), "big")
        r, s = ecdsa_sign(m, sk)
        return ES256Inputs(r, s, auth, cdh, pub)

    circ = ES256Circuit()
    circ.params.degree = k
    t0 = time.time()
    inputs = fresh_inputs()
    cs, fixed, advice, copies = circ.build(inputs)
    log(f"ES256 circuit built in {time.time()-t0:.1f}s "
        f"(advice cols: {cs.num_advice})")
    srs = get_srs(k)
    t0 = time.time()
    pk = keygen_cached(srs, cs, fixed, copies)
    log(f"pk ready in {time.time()-t0:.1f}s")

    t0 = time.time()
    proof = create_proof(pk, advice, [])
    warm = time.time() - t0
    log(f"warmup proof (incl. compile): {warm:.1f}s; {len(proof)} bytes")

    times = []
    for i in range(int(os.environ.get("WH2_BENCH_ITERS", "2"))):
        t0 = time.time()
        inputs = fresh_inputs()
        cs2, _f, advice, _c = circ.build(inputs)
        proof = create_proof(pk, advice, [])
        times.append(time.time() - t0)
        log(f"proof {i}: {times[-1]:.3f}s")

    t0 = time.time()
    ok = verify_proof(pk.vk, srs, proof, [])
    log(f"verify: {ok} in {time.time()-t0:.2f}s")
    assert ok, "ES256 proof failed verification"

    best = min(times)
    print(json.dumps({
        "metric": f"es256_webauthn_proof_time_k{k}",
        "value": round(best, 4),
        "unit": "s",
        # no reference number exists: es256 was never finished upstream
        "vs_baseline": None,
        "proof_bytes": len(proof),
    }), flush=True)


if __name__ == "__main__":
    main()
