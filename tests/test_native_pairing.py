"""Native bn254 pairing/MSM library vs the pure-Python tower oracle.

The Python implementation in fields/pairing.py is itself validated by
the reference's frozen verifier artifacts (test_reference_verifier.py),
so agreement here chains the native library to reference behavior.
"""
import random

import pytest

from webauthn_halo2_tpu.fields import pairing_native as PN
from webauthn_halo2_tpu.fields.pairing import pairing_check as py_pairing_check
from webauthn_halo2_tpu.fields.ref_curve import BN254_G1_CURVE as G
from webauthn_halo2_tpu.plonk.srs import get_srs

pytestmark = pytest.mark.skipif(
    not PN.available(), reason="native pairing library not built")


def test_trivial_product_is_one():
    srs = get_srs(4)
    a = G.mul(123456789, G.g)
    assert PN.pairing_check([(a, srs.g2), (G.neg(a), srs.g2)]) is True


def test_bilinearity_with_tau_g2():
    # e(s*G, tau*G2) * e(-(s*tau? )) is unavailable without tau; instead
    # check e(C, G2) * e(-C, G2) over the tau side and a mixed false case.
    srs = get_srs(4)
    c = G.mul(987654321, G.g)
    assert PN.pairing_check([(c, srs.s_g2), (G.neg(c), srs.s_g2)]) is True
    assert PN.pairing_check([(c, srs.s_g2), (G.neg(c), srs.g2)]) is False


def test_agreement_with_python_oracle():
    srs = get_srs(4)
    rng = random.Random(7)
    for _ in range(3):
        p1 = G.mul(rng.randrange(1, 2**60), G.g)
        p2 = G.mul(rng.randrange(1, 2**60), G.g)
        pairs = [(p1, srs.g2), (p2, srs.s_g2)]
        assert PN.pairing_check(pairs) == py_pairing_check(pairs)
    # infinity entries are skipped identically
    pairs = [(None, srs.g2), (G.mul(5, G.g), srs.g2),
             (G.neg(G.mul(5, G.g)), srs.g2)]
    assert PN.pairing_check(pairs) == py_pairing_check(pairs) is True


def test_msm_matches_host_oracle():
    rng = random.Random(11)
    pts = [G.mul(rng.randrange(1, 2**40), G.g) for _ in range(37)]
    sc = [rng.randrange(0, G.n) for _ in range(37)]
    got = PN.g1_msm(list(zip(pts, sc)))
    acc = None
    for p, s in zip(pts, sc):
        acc = G.add(acc, G.mul(s, p))
    assert got == acc


def test_msm_edge_cases():
    p = G.mul(42, G.g)
    assert PN.g1_msm([]) is None
    assert PN.g1_msm([(None, 5), (p, 0)]) is None
    assert PN.g1_msm([(p, 1)]) == p
    # s*P + (r-s)*P = r*P = infinity? no: order of G1 subgroup
    assert PN.g1_msm([(p, G.n - 1), (p, 1)]) is None
