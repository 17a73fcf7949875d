#!/usr/bin/env python
"""Phase-level profiling of SRS/circuit/keygen/proof at k=17 on the real TPU."""
import os
import sys
import time

os.environ.setdefault("WH2_SRS_DIR", os.path.join(os.path.dirname(__file__), "..", "artifacts"))
os.environ.setdefault("WH2_TRACE", "1")

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "artifacts", "jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    k = int(os.environ.get("WH2_BENCH_K", "17"))
    import secrets

    from webauthn_halo2_tpu.circuits.ecdsa_circuit import (
        CircuitParams,
        ECDSACircuit,
        ECDSAInputs,
    )
    from webauthn_halo2_tpu.fields.constants import P256_N
    from webauthn_halo2_tpu.fields.ref_curve import ecdsa_keygen, ecdsa_sign
    from webauthn_halo2_tpu.plonk.keygen import keygen
    from webauthn_halo2_tpu.plonk.prover import create_proof
    from webauthn_halo2_tpu.plonk.srs import get_srs
    from webauthn_halo2_tpu.plonk.verifier import verify_proof

    log(f"devices: {jax.devices()}")
    params = CircuitParams(degree=k)
    t0 = time.time(); srs = get_srs(k); log(f"SRS: {time.time()-t0:.1f}s")
    circuit = ECDSACircuit(params)
    t0 = time.time()
    cs, fixed, _advice, copies = circuit.build(ECDSAInputs.dummy())
    log(f"circuit build: {time.time()-t0:.1f}s")
    t0 = time.time()
    pk = keygen(srs, cs, fixed, copies)
    log(f"keygen: {time.time()-t0:.1f}s")

    sk, pub = ecdsa_keygen()
    m = secrets.randbelow(P256_N)
    r, s = ecdsa_sign(m, sk)
    t0 = time.time()
    advice = circuit.witness(ECDSAInputs(r, s, m, pub))
    log(f"witness: {time.time()-t0:.1f}s")
    t0 = time.time()
    proof = create_proof(pk, advice, [])
    log(f"proof 1 (warm compile): {time.time()-t0:.1f}s, {len(proof)} B")
    t0 = time.time()
    proof = create_proof(pk, advice, [])
    log(f"proof 2 (steady): {time.time()-t0:.1f}s")
    t0 = time.time()
    ok = verify_proof(pk.vk, srs, proof, [])
    log(f"verify: {ok} {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
