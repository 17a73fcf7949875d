#!/usr/bin/env python
"""EVM-path end-to-end on TPU: GWC+Keccak proof -> generated Yul verifier
-> interpreter dry-run (BASELINE config 4: "EVM-transcript proof +
generate_evm_verifier, verified"). Writes the verifier artifacts
(results/P256Verifier.{yul,sol,code}) — the reference's generated-artifact
parity (proving-server/P256Verifier.*).
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    scheme = os.environ.get("WH2_EVM_SCHEME", "shplonk")
    sfx = "" if scheme == "gwc" else "_shplonk"
    from webauthn_halo2_tpu import api
    from webauthn_halo2_tpu.circuits.ecdsa_circuit import CircuitParams
    from webauthn_halo2_tpu.fields.constants import P256_N
    from webauthn_halo2_tpu.fields.ref_curve import ecdsa_keygen, ecdsa_sign

    params = CircuitParams()
    sk, pub = ecdsa_keygen()
    m = secrets.randbelow(P256_N)
    r, s = ecdsa_sign(m, sk)

    def le(x):
        return int(x).to_bytes(32, "little")

    t0 = time.time()
    proof = api.generate_proof_evm(
        le(r), le(s), le(pub[0]), le(pub[1]), le(m), params=params,
        scheme=scheme,
    )
    log(f"evm proof ({scheme}): {time.time()-t0:.1f}s, {len(proof)} bytes")

    t0 = time.time()
    ok = api.verify_evm(proof, params=params, scheme=scheme)
    log(f"host verify_evm: {ok} in {time.time()-t0:.1f}s")
    assert ok

    os.makedirs("results", exist_ok=True)
    t0 = time.time()
    gas = api.generate_verifier(
        sol_code_path=f"results/P256Verifier{sfx}.sol",
        deploy_code_path=f"results/P256Verifier{sfx}.code",
        yul_code_path=f"results/P256Verifier{sfx}.yul",
        valid_proof_hex=proof.hex(),
        params=params,
        scheme=scheme,
    )
    log(f"generate_verifier + bytecode dry-run: OK in {time.time()-t0:.1f}s; "
        f"verify gas = {gas} (reference validateUserOp avg 399,477 — "
        f"contracts/README.md:23)")

    # tamper check through the interpreter
    from webauthn_halo2_tpu.evm.yul_interp import run_yul_verifier

    yul = open(f"results/P256Verifier{sfx}.yul").read()
    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 1
    assert not run_yul_verifier(yul, bytes(bad)), "tampered proof accepted!"
    log("tampered proof correctly rejected")

    # persist the proof so tests/test_chain_e2e.py's production fixture can
    # drive handleOps with the real circuit (t.sol's validSignature parity)
    with open(f"results/proof_{scheme}_k17.hex", "w") as f:
        f.write(proof.hex())
    import json as _json

    gp = "results/evm_gas.json"
    rec = {}
    if os.path.exists(gp):
        rec = _json.load(open(gp))
    rec.update({"k": 17, f"verify_gas_{scheme}": gas,
                "proof_bytes_" + scheme: len(proof),
                "reference_validate_user_op_avg": 399_477})
    if scheme == "gwc":
        rec["verify_gas"] = gas
    with open(gp, "w") as f:
        _json.dump(rec, f)
    print('{"metric": "evm_verify_gas_k17_%s", "value": %d, "unit": "gas", '
          '"vs_baseline": %.3f}' % (scheme, gas, 399_477 / gas))


if __name__ == "__main__":
    main()
