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


def test_prove_and_verify_with_public_inputs():
    """Instance-column (public input) support: the verifier computes the
    instance commitment from the public values itself and the multiopen
    pins the claimed evals to it — the plumbing needed to bind the
    userOpHash into the proof (P256Account.sol:77 TODO, SURVEY §7.4)."""
    cs = CS.ConstraintSystem(num_fixed=1, num_advice=1, num_instance=1)
    q = CS.fixed(0)
    cs.gate("pub", q * (CS.advice(0) - CS.instance(0)))
    n = 1 << K
    usable = cs.usable_rows(n)
    pub = [42, 99]
    adv = [42, 99] + [0] * (usable - 2)
    qcol = [1, 1] + [0] * (n - 2)

    # mock prover first (test-pyramid parity)
    assert mock_prove(cs, K, [qcol], [adv], instance_cols=[pub]) == []
    bad = list(adv)
    bad[0] = 43
    assert mock_prove(cs, K, [qcol], [bad], instance_cols=[pub]) != []

    srs = get_srs(K)
    pk = keygen(srs, cs, [qcol], [])
    proof = create_proof(pk, [adv], [pub])
    assert verify_proof(pk.vk, srs, proof, [pub])
    # a different public input must be rejected (binding)
    assert not verify_proof(pk.vk, srs, proof, [[43, 99]])
    assert not verify_proof(pk.vk, srs, proof, [[42]])

    # GWC/Keccak (EVM) path as well
    from webauthn_halo2_tpu.plonk.transcript import KeccakRead, KeccakWrite

    proof2 = create_proof(pk, [adv], [pub], scheme="gwc",
                          transcript=KeccakWrite())
    assert verify_proof(pk.vk, srs, proof2, [pub], scheme="gwc",
                        transcript=KeccakRead(proof2))
    assert not verify_proof(pk.vk, srs, proof2, [[43, 99]], scheme="gwc",
                            transcript=KeccakRead(proof2))


def test_batch_proving_independent_proofs():
    """Batched multi-signature proving (BASELINE config 5 / SURVEY §2.3):
    B witnesses through the shared compiled phase graphs -> B distinct
    proofs, all verifying. DP sharding needs no collectives (proofs are
    independent); the compile cost is amortized across the batch."""
    cs = build_toy()
    n = 1 << K
    fixed, advice, copies = build_witness(cs, n)
    srs = get_srs(K)
    pk = keygen(srs, cs, fixed, copies)
    proofs = [create_proof(pk, advice, []) for _ in range(3)]
    assert len({p for p in proofs}) == 3  # blinding -> distinct bytes
    for p in proofs:
        assert verify_proof(pk.vk, srs, p, [])
