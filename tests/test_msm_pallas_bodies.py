"""Default-suite coverage of the fused-MSM kernel math (ops/msm_pallas.py).

The pallas_call wrappers are exercised by the slow interpret-mode tests
and the real-TPU bench; interpret mode is far too slow for CI (minutes
per tiny MSM). The kernel BODIES, however, are pure jnp functions over
(L, K) blocks — this file runs them directly against the ops/ec.py device
oracle and the host curve, so the in-kernel field/EC arithmetic (where
the correctness risk is) gets fast default-suite coverage.
"""
import jax.numpy as jnp
import numpy as np

from webauthn_halo2_tpu.fields.limbs import FR_SPEC, L
from webauthn_halo2_tpu.fields.ref_curve import BN254_G1_CURVE
from webauthn_halo2_tpu.ops import ec as E
from webauthn_halo2_tpu.ops import msm_pallas as MP

CURVE = E.BN254_CURVE
FQ = CURVE.field
_rng = np.random.default_rng(42)


def _consts():
    return [
        jnp.asarray(np.asarray(v).reshape(L, 1), jnp.int32)
        for v in (FQ.p_limbs, FQ.one_mont, FQ.sub_pad, FQ.c256_limbs)
    ]


def _rand_points(k):
    return [BN254_G1_CURVE.mul(int(s), BN254_G1_CURVE.g)
            for s in _rng.integers(1, 1 << 62, size=k)]


def _affine(xyz):
    return E.to_affine_ints(CURVE, E.JPoint(*xyz))


def test_madd_body_matches_oracle():
    K = 8
    p_col, one, pad, c256 = _consts()
    a = _rand_points(K)
    b = _rand_points(K)
    A = E.from_affine_ints(CURVE, a)
    B = E.from_affine_ints(CURVE, b)
    x3, y3, z3 = MP._madd_body(
        FQ, A.x, A.y, A.z, B.x, B.y, p_col, pad, c256, one
    )
    got = _affine((x3, y3, z3))
    want = [BN254_G1_CURVE.add(pa, pb) for pa, pb in zip(a, b)]
    assert got == want


def test_jadd_unsafe_body_infinity_aware():
    K = 8
    p_col, one, pad, c256 = _consts()
    a = _rand_points(K)
    b = _rand_points(K)
    A = E.from_affine_ints(CURVE, a)
    B = E.from_affine_ints(CURVE, b)
    inf = E.infinity((K,), CURVE)
    # finite + finite
    got = _affine(MP._jadd_unsafe_body(
        FQ, (A.x, A.y, A.z), (B.x, B.y, B.z), p_col, pad, c256))
    assert got == [BN254_G1_CURVE.add(pa, pb) for pa, pb in zip(a, b)]
    # inf + finite and finite + inf
    got = _affine(MP._jadd_unsafe_body(
        FQ, (inf.x, inf.y, inf.z), (B.x, B.y, B.z), p_col, pad, c256))
    assert got == b
    got = _affine(MP._jadd_unsafe_body(
        FQ, (A.x, A.y, A.z), (inf.x, inf.y, inf.z), p_col, pad, c256))
    assert got == a


def test_jadd_complete_body_degenerate_cases():
    K = 4
    p_col, one, pad, c256 = _consts()
    a = _rand_points(K)
    A = E.from_affine_ints(CURVE, a)
    neg = [(x, (-y) % FQ.p) for x, y in a]
    Aneg = E.from_affine_ints(CURVE, neg)
    # P + P -> double
    got = _affine(MP._jadd_complete_body(
        FQ, (A.x, A.y, A.z), (A.x, A.y, A.z), p_col, pad, c256))
    assert got == [BN254_G1_CURVE.add(p, p) for p in a]
    # P + (-P) -> infinity
    got = _affine(MP._jadd_complete_body(
        FQ, (A.x, A.y, A.z), (Aneg.x, Aneg.y, Aneg.z), p_col, pad, c256))
    assert got == [None] * K


def test_jdouble_body():
    K = 8
    p_col, one, pad, c256 = _consts()
    a = _rand_points(K)
    A = E.from_affine_ints(CURVE, a)
    got = _affine(MP._jdouble_body(FQ, (A.x, A.y, A.z), p_col, pad, c256))
    assert got == [BN254_G1_CURVE.add(p, p) for p in a]


def test_is_zero_body():
    p_col, one, pad, c256 = _consts()
    vals = jnp.asarray(FQ.encode([0, 1, FQ.p - 1, 12345]))
    got = np.asarray(MP._is_zero_body(FQ, vals, p_col, c256))
    assert got.tolist() == [True, False, False, False]
