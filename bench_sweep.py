#!/usr/bin/env python
"""k-sweep benchmark: the reference's bench_secp256r1_ecdsa parity
(ecdsa_p256.rs:473-614). Writes results/ecdsa_bench.csv with the same
columns as halo2-circuits/src/results/ecdsa_bench.csv.

Usage: python bench_sweep.py [k1,k2,...]   (default: 17,16,15)
"""
import os
import secrets
import sys
import time

os.environ.setdefault("WH2_SRS_DIR", os.path.join(os.path.dirname(__file__), "artifacts"))
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts", "jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    # queue kill-switch: the session driver must find the chip idle at
    # round end; `touch logs/STOP_QUEUE` makes queued steps no-op
    if os.path.exists(os.path.join(os.path.dirname(__file__), "logs", "STOP_QUEUE")):
        print("STOP_QUEUE sentinel present; skipping", file=sys.stderr)
        return
    ks = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "17,16,15").split(",")]
    from webauthn_halo2_tpu.circuits.ecdsa_circuit import (
        ECDSACircuit, ECDSAInputs, auto_params,
    )
    from webauthn_halo2_tpu.fields.constants import P256_N
    from webauthn_halo2_tpu.fields.ref_curve import ecdsa_keygen, ecdsa_sign
    from webauthn_halo2_tpu.plonk.pk_cache import keygen_cached
    from webauthn_halo2_tpu.plonk.prover import create_proof
    from webauthn_halo2_tpu.plonk.srs import get_srs
    from webauthn_halo2_tpu.plonk.verifier import verify_proof

    os.makedirs("results", exist_ok=True)
    path = os.path.join("results", "ecdsa_bench.csv")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write("degree,num_advice,num_lookup,num_fixed,lookup_bits,"
                    "limb_bits,num_limbs,proof_time,proof_size,verify_time\n")

    for k in ks:
        params = auto_params(k)
        srs = get_srs(k)
        # auto_params estimates from total cell count; the builder's
        # per-column fill is not perfectly balanced, so grow columns
        # until the witness actually fits (the build is the check)
        for attempt in range(5):
            print(f"k={k}: {params}", file=sys.stderr, flush=True)
            circuit = ECDSACircuit(params)
            try:
                cs, fixed, _a, copies = circuit.build(ECDSAInputs.dummy())
                break
            except AssertionError as e:
                print(f"k={k}: retry ({e})", file=sys.stderr, flush=True)
                if not params.balance_columns:
                    # round-robin region placement skews column fills;
                    # load-balancing usually fits without extra columns
                    params.balance_columns = True
                else:
                    params.num_advice += 1
                    params.num_lookup_advice += (attempt == 3)
        else:
            raise RuntimeError(f"k={k}: could not fit circuit")
        pk = keygen_cached(srs, cs, fixed, copies)

        sk, pub = ecdsa_keygen()
        m = secrets.randbelow(P256_N)
        r, s = ecdsa_sign(m, sk)
        advice = circuit.witness(ECDSAInputs(r, s, m, pub))
        create_proof(pk, advice, [])  # warm/compile
        t0 = time.time()
        proof = create_proof(pk, advice, [])
        pt = time.time() - t0
        t0 = time.time()
        ok = verify_proof(pk.vk, srs, proof, [])
        vt = time.time() - t0
        assert ok
        with open(path, "a") as f:
            f.write(f"{k},{params.num_advice},{params.num_lookup_advice},1,"
                    f"{params.lookup_bits},88,3,{pt:.3f}s,{len(proof)},"
                    f"{vt*1000:.3f}ms\n")
        print(f"k={k}: proof {pt:.2f}s size {len(proof)} verify {vt:.3f}s",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
