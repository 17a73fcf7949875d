"""End-to-end PLONK pipeline on a toy circuit: mock -> keygen -> prove -> verify.

The toy circuit exercises every argument the ECDSA circuit needs:
a vertical flex gate (a + b*c = d over one advice column with rotations),
a range lookup (advice column vs fixed table), and copy constraints
(permutation argument) — the same subsystem mix as halo2-base (SURVEY §2.2).
"""
import secrets

import pytest

from webauthn_halo2_tpu.fields.constants import BN254_FR
from webauthn_halo2_tpu.plonk import cs as CS
from webauthn_halo2_tpu.plonk.keygen import keygen
from webauthn_halo2_tpu.plonk.mock import mock_prove
from webauthn_halo2_tpu.plonk.prover import create_proof
from webauthn_halo2_tpu.plonk.srs import get_srs
from webauthn_halo2_tpu.plonk.verifier import verify_proof

R = BN254_FR
K = 6


def build_toy():
    """Columns: fixed0 = q (gate selector), fixed1 = table;
    advice0 = gate column, advice1 = lookup input column."""
    cs = CS.ConstraintSystem(num_fixed=2, num_advice=2)
    q = CS.fixed(0)
    a = CS.advice(0)
    cs.gate(
        "vgate",
        q * (CS.advice(0, 0) + CS.advice(0, 1) * CS.advice(0, 2) - CS.advice(0, 3)),
    )
    cs.lookup("range8", [CS.advice(1)], [CS.fixed(1)])
    cs.enable_permutation(CS.ADVICE, 0)
    cs.enable_permutation(CS.ADVICE, 1)
    return cs


def build_witness(cs, n):
    """Gate chains at rows 0 and 4: a + b*c = d; copy d(row3) == a(row4);
    advice1 holds 3-bit values, two cells copied between the columns."""
    usable = cs.usable_rows(n)
    a0, b0, c0 = 3, 5, 7
    d0 = (a0 + b0 * c0) % R  # row3 = 38
    b1, c1 = 2, 4
    d1 = (d0 + b1 * c1) % R  # row7 = 46
    adv0 = [a0, b0, c0, d0, d0, b1, c1, d1] + [0] * (usable - 8)
    # lookup column: 3-bit values; cell 2 must equal advice0 row1 (=5)
    adv1 = [1, 6, 5, 7, 0, 2] + [0] * (usable - 6)
    q = [1, 0, 0, 0, 1, 0, 0, 0] + [0] * (n - 8)
    table = [i for i in range(8)] + [0] * (n - 8)
    copies = [
        ((CS.ADVICE, 0, 3), (CS.ADVICE, 0, 4)),
        ((CS.ADVICE, 0, 1), (CS.ADVICE, 1, 2)),
    ]
    return [q, table], [adv0, adv1], copies


def test_mock_prover_accepts_and_rejects():
    cs = build_toy()
    n = 1 << K
    fixed, advice, copies = build_witness(cs, n)
    assert mock_prove(cs, K, fixed, advice, copies=copies) == []

    bad_advice = [list(advice[0]), list(advice[1])]
    bad_advice[0][3] = (bad_advice[0][3] + 1) % R  # break the gate
    fails = mock_prove(cs, K, fixed, bad_advice, copies=copies)
    assert any("vgate" in f for f in fails)

    bad_advice2 = [list(advice[0]), list(advice[1])]
    bad_advice2[1][0] = 9  # out of the 3-bit table
    fails2 = mock_prove(cs, K, fixed, bad_advice2, copies=copies)
    assert any("lookup" in f for f in fails2)


def test_prove_and_verify_toy():
    cs = build_toy()
    n = 1 << K
    fixed, advice, copies = build_witness(cs, n)
    srs = get_srs(K)
    pk = keygen(srs, cs, fixed, copies)
    proof = create_proof(pk, advice, [])
    assert isinstance(proof, bytes) and len(proof) > 0
    assert verify_proof(pk.vk, srs, proof, [])

    # tampering anywhere must reject
    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 1
    assert not verify_proof(pk.vk, srs, bytes(bad), [])


def test_prove_rejects_on_bad_copy_witness():
    """A witness violating a copy constraint must fail verification."""
    cs = build_toy()
    n = 1 << K
    fixed, advice, copies = build_witness(cs, n)
    srs = get_srs(K)
    pk = keygen(srs, cs, fixed, copies)
    bad_advice = [list(advice[0]), list(advice[1])]
    bad_advice[0][4] = 999  # breaks copy (0,3)==(0,4) and the second gate
    q = fixed[0]
    # also fix the gate so ONLY the permutation argument must catch it
    bad_advice[0][7] = (999 + 2 * 4) % R
    proof = create_proof(pk, bad_advice, [])
    assert not verify_proof(pk.vk, srs, proof, [])


def test_prove_and_verify_toy_gwc_keccak():
    """The EVM path: GWC multiopen + Keccak transcript (prove_evm parity)."""
    from webauthn_halo2_tpu.plonk.transcript import KeccakRead, KeccakWrite

    cs = build_toy()
    n = 1 << K
    fixed, advice, copies = build_witness(cs, n)
    srs = get_srs(K)
    pk = keygen(srs, cs, fixed, copies)
    proof = create_proof(pk, advice, [], scheme="gwc", transcript=KeccakWrite())
    assert verify_proof(pk.vk, srs, proof, [], scheme="gwc",
                        transcript=KeccakRead(proof))
    bad = bytearray(proof)
    bad[len(bad) // 3] ^= 1
    assert not verify_proof(pk.vk, srs, bytes(bad), [], scheme="gwc",
                            transcript=KeccakRead(bytes(bad)))
