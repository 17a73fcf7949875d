"""Gadget-stack tests: CRT bigint chip, EC chip, ECDSA gadget (MockProver).

Mirrors the reference's MockProver-based circuit test strategy
(SURVEY §4.1, ecdsa_p256.rs:209-248): random fixtures generated in-test.
"""
import secrets

import pytest

from webauthn_halo2_tpu.circuits.bigint import CrtChip
from webauthn_halo2_tpu.circuits.builder import CircuitBuilder
from webauthn_halo2_tpu.circuits.ecc import EccChip
from webauthn_halo2_tpu.circuits.ecdsa import EcdsaChip
from webauthn_halo2_tpu.fields.constants import P256_N, P256_P
from webauthn_halo2_tpu.fields.ref_curve import (
    P256_CURVE,
    ecdsa_keygen,
    ecdsa_sign,
)
from webauthn_halo2_tpu.plonk.mock import mock_prove

K = 13
LB = 11


def run_mock(b, k=K):
    cs, fixed, advice, copies = b.finalize(k)
    return mock_prove(cs, k, fixed, advice, copies=copies)


def test_crt_chip_ops():
    b = CircuitBuilder(num_advice=3, num_lookup_advice=1, lookup_bits=LB)
    chip = CrtChip(b, P256_P)
    x = secrets.randbelow(P256_P)
    y = secrets.randbelow(P256_P)
    a = chip.load(x)
    c = chip.load(y)
    prod = chip.mul(a, c)
    assert prod.value == x * y % P256_P
    s = chip.add(a, c)
    assert s.value == (x + y) % P256_P
    d = chip.sub(a, c)
    assert d.value == (x - y) % P256_P
    chip.enforce_canonical(a)
    chip.assert_nonzero_mod(a)
    w = chip.div(a, c)
    assert w.value * y % P256_P == x
    assert run_mock(b) == []


def test_crt_chip_catches_bad_product():
    b = CircuitBuilder(num_advice=3, num_lookup_advice=1, lookup_bits=LB)
    chip = CrtChip(b, P256_P)
    a = chip.load(12345)
    c = chip.load(67890)
    prod = chip.mul(a, c)
    cs, fixed, advice, copies = b.finalize(K)
    # corrupt the product's low limb in the assigned advice
    col, row = prod.limbs[0].col, prod.limbs[0].row
    advice[col][row] = (advice[col][row] + 1) % P256_P
    fails = mock_prove(cs, K, fixed, advice, copies=copies)
    assert fails, "tampered product must violate constraints"


def test_ec_chip_add_double():
    b = CircuitBuilder(num_advice=3, num_lookup_advice=1, lookup_bits=LB)
    fp = CrtChip(b, P256_P)
    ecc = EccChip(b, fp, P256_CURVE)
    p1 = P256_CURVE.random_point()
    p2 = P256_CURVE.random_point()
    q1 = ecc.load_point(p1)
    q2 = ecc.load_point(p2)
    s = ecc.add_unequal(q1, q2)
    assert (s.x.value, s.y.value) == P256_CURVE.add(p1, p2)
    d = ecc.double(q1)
    assert (d.x.value, d.y.value) == P256_CURVE.add(p1, p1)
    assert run_mock(b) == []


@pytest.mark.slow
def test_ecdsa_gadget_mock():
    """Full ECDSA verify circuit at the production degree (k=17)."""
    b = CircuitBuilder(num_advice=7, num_lookup_advice=1, lookup_bits=16)
    chip = EcdsaChip(b)
    sk, pk = ecdsa_keygen()
    m = secrets.randbelow(P256_N)
    r, s = ecdsa_sign(m, sk)
    chip.verify(r, s, m, pk)
    assert run_mock(b, k=17) == []


def test_ecdsa_gadget_rejects_bad_signature():
    b = CircuitBuilder(num_advice=7, num_lookup_advice=1, lookup_bits=16)
    chip = EcdsaChip(b)
    sk, pk = ecdsa_keygen()
    m = secrets.randbelow(P256_N)
    r, s = ecdsa_sign(m, sk)
    with pytest.raises(Exception):
        # invalid witness cannot even synthesize (builder gate asserts fire)
        chip.verify(r, (s + 1) % P256_N, m, pk)


@pytest.mark.slow
def test_ecdsa_forged_witness_rejected_by_constraints():
    """Soundness: a forged witness (tampered AFTER synthesis, so builder
    host asserts can't catch it) must violate the constraint system itself.

    This is the MockProver-level negative test the reference pins its
    circuit soundness on (SURVEY §4.1) — distinct from the witness-gen
    exception path above."""
    b = CircuitBuilder(num_advice=7, num_lookup_advice=1, lookup_bits=16)
    chip = EcdsaChip(b)
    sk, pk = ecdsa_keygen()
    m = secrets.randbelow(P256_N)
    r, s = ecdsa_sign(m, sk)
    res = chip.verify(r, s, m, pk)
    cs, fixed, advice, copies = b.finalize(17)
    # tamper the recovered point's x-coordinate low limb: this forges
    # "x(R') == r" and must break the integer-combo carry-chain gates
    from webauthn_halo2_tpu.fields.constants import BN254_FR

    advice[res.col][res.row] = (advice[res.col][res.row] + 1) % BN254_FR
    fails = mock_prove(cs, 17, fixed, advice, copies=copies)
    assert fails, "forged ECDSA witness must violate constraints"


@pytest.mark.slow
def test_ecdsa_expose_msghash_mock():
    """expose_msghash: the msghash limbs become instance values bound by
    copy constraints; a mismatched public input must fail the permutation
    argument (the on-chain binding's circuit half)."""
    from webauthn_halo2_tpu.circuits.ecdsa_circuit import (
        CircuitParams, ECDSACircuit, ECDSAInputs)

    params = CircuitParams(expose_msghash=True)
    circ = ECDSACircuit(params)
    sk, pk = ecdsa_keygen()
    m = secrets.randbelow(P256_N)
    r, s = ecdsa_sign(m, sk)
    inputs = ECDSAInputs(r, s, m, pk)
    cs, fixed, advice, copies = circ.build(inputs)
    assert cs.num_instance == 1
    pub = circ.public_inputs(inputs)
    assert mock_prove(cs, params.degree, fixed, advice,
                      instance_cols=pub, copies=copies) == []
    bad = [list(pub[0])]
    bad[0][0] = (bad[0][0] + 1) % (1 << 88)
    assert mock_prove(cs, params.degree, fixed, advice,
                      instance_cols=bad, copies=copies) != []
