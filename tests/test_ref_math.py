"""Host reference math: fields, curves, ECDSA, pairing oracle."""
import secrets

from webauthn_halo2_tpu.fields import constants as C
from webauthn_halo2_tpu.fields.ref_curve import (
    BN254_G1_CURVE,
    P256_CURVE,
    ecdsa_keygen,
    ecdsa_sign,
    ecdsa_verify,
)
from webauthn_halo2_tpu.fields.ref_field import batch_inv, inv_mod, sqrt_mod


def test_roots_of_unity():
    w = C.BN254_FR_ROOT_OF_UNITY
    r = C.BN254_FR
    assert pow(w, 1 << C.BN254_FR_S, r) == 1
    assert pow(w, 1 << (C.BN254_FR_S - 1), r) == r - 1  # primitive


def test_inv_and_sqrt():
    p = C.P256_P
    for _ in range(10):
        a = secrets.randbelow(p - 1) + 1
        assert a * inv_mod(a, p) % p == 1
        s = sqrt_mod(a * a % p, p)
        assert s is not None and s * s % p == a * a % p
    vals = [secrets.randbelow(p) for _ in range(20)] + [0]
    invs = batch_inv(vals, p)
    for v, iv in zip(vals, invs):
        assert (v == 0 and iv == 0) or v * iv % p == 1


def test_curve_group_laws():
    for curve in (P256_CURVE, BN254_G1_CURVE):
        g = curve.g
        assert curve.is_on_curve(g)
        assert curve.mul(curve.n, g) is None  # order
        p2 = curve.add(g, g)
        assert curve.is_on_curve(p2)
        assert curve.add(p2, curve.neg(g)) == g
        a, b = secrets.randbelow(curve.n), secrets.randbelow(curve.n)
        lhs = curve.mul(a + b, g)
        rhs = curve.add(curve.mul(a, g), curve.mul(b, g))
        assert lhs == rhs


def test_ecdsa_roundtrip():
    sk, pk = ecdsa_keygen()
    m = secrets.randbelow(C.P256_N)
    r, s = ecdsa_sign(m, sk)
    assert ecdsa_verify(m, r, s, pk)
    assert not ecdsa_verify((m + 1) % C.P256_N, r, s, pk)
    assert not ecdsa_verify(m, r, (s + 1) % C.P256_N, pk)


def test_pairing_bilinearity():
    from webauthn_halo2_tpu.fields.pairing import pairing_check

    g1 = C.BN254_G1
    g2 = (C.BN254_G2_X, C.BN254_G2_Y)
    a = 1234567
    b = 89101112
    aG1 = BN254_G1_CURVE.mul(a, g1)
    # e(aG1, g2) * e(-G1, a*g2-ish) check via: e(a*G1, G2) == e(G1, G2)^a
    # Cheap structural check: e(aG1, G2) * e(G1, G2)^(r-a) == 1
    # Do it as: e(aG1, G2) * e((r-a)G1, G2) == e(rG1, G2) == 1
    naG1 = BN254_G1_CURVE.mul(C.BN254_FR - a, g1)
    assert pairing_check([(aG1, g2), (naG1, g2)])
    bG1 = BN254_G1_CURVE.mul(b, g1)
    assert not pairing_check([(aG1, g2), (bG1, g2)])
