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


def test_generated_verifier_with_public_inputs():
    """On-chain public-input binding (the reference's P256Account.sol:77
    TODO): the generated verifier computes the instance commitment from
    leading calldata words and binds the proof to them — wrong or missing
    public inputs revert at the bytecode level."""
    from webauthn_halo2_tpu.evm.machine import Chain
    from webauthn_halo2_tpu.evm.yul_asm import compile_yul
    from webauthn_halo2_tpu.plonk import cs as CSm

    cs = CSm.ConstraintSystem(num_fixed=1, num_advice=1, num_instance=1)
    q = CSm.fixed(0)
    cs.gate("pub", q * (CSm.advice(0) - CSm.instance(0)))
    cs.enable_permutation(CSm.ADVICE, 0)
    cs.enable_permutation(CSm.INSTANCE, 0)
    n = 1 << K
    usable = cs.usable_rows(n)
    pub = [42, 99]
    adv = [42, 99] + [0] * (usable - 2)
    qcol = [1, 1] + [0] * (n - 2)
    srs = get_srs(K)
    pk = keygen(srs, cs, [qcol], [((CSm.ADVICE, 0, 0), (CSm.INSTANCE, 0, 0)),
                                  ((CSm.ADVICE, 0, 1), (CSm.INSTANCE, 0, 1))])
    proof = create_proof(pk, [adv], [pub], scheme="gwc",
                         transcript=KeccakWrite())
    assert verify_proof(pk.vk, srs, proof, [pub], scheme="gwc",
                        transcript=KeccakRead(proof))

    yul, _sol = generate_verifier(pk.vk, srs, num_public=len(pub))
    deploy, _rt = compile_yul(yul)
    chain = Chain()
    addr, res = chain.create(0xBEEF, deploy)
    assert res.success

    def calldata(pubs, prf):
        return b"".join(v.to_bytes(32, "big") for v in pubs) + prf

    ok = chain.call(0xBEEF, addr, calldata(pub, proof))
    assert ok.success, "verifier rejected valid (pub, proof)"
    # wrong public input -> bound proof must fail
    assert not chain.call(0xBEEF, addr, calldata([43, 99], proof)).success
    assert not chain.call(0xBEEF, addr, calldata([42, 98], proof)).success
    # missing public inputs -> calldata misparse -> revert
    assert not chain.call(0xBEEF, addr, proof).success


def test_generated_shplonk_verifier_dry_run_and_gas():
    """SHPLONK+Keccak proof through the SHPLONK-form generated verifier:
    accepted, tamper/truncation rejected, and ~half the GWC ecMul count
    (VERDICT r4 #5 — the gas gap is GWC's per-query scalar muls)."""
    cs = build_toy()
    n = 1 << K
    fixed, advice, copies = build_witness(cs, n)
    srs = get_srs(K)
    pk = keygen(srs, cs, fixed, copies)
    proof = create_proof(pk, advice, [], scheme="shplonk",
                         transcript=KeccakWrite())
    assert verify_proof(pk.vk, srs, proof, [], scheme="shplonk",
                        transcript=KeccakRead(proof))

    yul, _sol = generate_verifier(pk.vk, srs, scheme="shplonk")
    gwc_yul, _ = generate_verifier(pk.vk, srs)
    assert yul.count("staticcall(gas(), 7,") < \
        0.7 * gwc_yul.count("staticcall(gas(), 7,")
    assert yul.count("staticcall(gas(), 5,") == 1  # ONE batched modexp
    assert run_yul_verifier(yul, proof), \
        "shplonk yul verifier rejected a valid proof"

    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 1
    assert not run_yul_verifier(yul, bytes(bad))
    assert not run_yul_verifier(yul, proof[:-32])
