"""EVM verifier codegen + Yul dry-run (revm-parity, SURVEY §4.4)."""
import sys

import pytest

sys.path.insert(0, "tests")
from test_plonk_e2e import K, build_toy, build_witness

from webauthn_halo2_tpu.evm.codegen import generate_verifier
from webauthn_halo2_tpu.evm.yul_interp import run_yul_verifier
from webauthn_halo2_tpu.plonk.keygen import keygen
from webauthn_halo2_tpu.plonk.prover import create_proof
from webauthn_halo2_tpu.plonk.srs import get_srs
from webauthn_halo2_tpu.plonk.transcript import KeccakRead, KeccakWrite
from webauthn_halo2_tpu.plonk.verifier import verify_proof


def test_generated_yul_verifier_dry_run():
    cs = build_toy()
    n = 1 << K
    fixed, advice, copies = build_witness(cs, n)
    srs = get_srs(K)
    pk = keygen(srs, cs, fixed, copies)
    proof = create_proof(pk, advice, [], scheme="gwc", transcript=KeccakWrite())
    # sanity: host verifier accepts
    assert verify_proof(pk.vk, srs, proof, [], scheme="gwc",
                        transcript=KeccakRead(proof))

    yul, sol = generate_verifier(pk.vk, srs)
    assert "plonk_verifier" in yul and "contract Verifier" in sol
    assert run_yul_verifier(yul, proof), "yul verifier rejected a valid proof"

    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 1
    assert not run_yul_verifier(yul, bytes(bad))
    # truncation must also revert
    assert not run_yul_verifier(yul, proof[:-32])


def test_generated_verifier_real_bytecode_and_gas():
    """Assemble the generated Yul to REAL bytecode, deploy it in the
    bytecode EVM, and dry-run a valid proof with gas metering — the
    revm-parity step the reference does at ecdsa_p256.rs:303-324."""
    from webauthn_halo2_tpu.evm.machine import Chain
    from webauthn_halo2_tpu.evm.yul_asm import compile_yul

    cs = build_toy()
    n = 1 << K
    fixed, advice, copies = build_witness(cs, n)
    srs = get_srs(K)
    pk = keygen(srs, cs, fixed, copies)
    proof = create_proof(pk, advice, [], scheme="gwc", transcript=KeccakWrite())
    yul, _sol = generate_verifier(pk.vk, srs)

    deploy, runtime = compile_yul(yul)
    chain = Chain()
    sender = 0xBEEF
    addr, res = chain.create(sender, deploy)
    assert res.success, "verifier deployment failed"
    assert chain.account(addr).code == runtime

    ok = chain.call(sender, addr, proof)
    assert ok.success, "bytecode verifier rejected a valid proof"
    assert 0 < ok.gas_used < 30_000_000
    print(f"verifier gas: {ok.gas_used}")

    # tamper + truncation must revert at the bytecode level
    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 1
    assert not chain.call(sender, addr, bytes(bad)).success
    assert not chain.call(sender, addr, proof[:-32]).success
