"""Device Jacobian EC ops vs the host curve oracle."""
import secrets

import jax.numpy as jnp
import numpy as np

from webauthn_halo2_tpu.fields.constants import BN254_FR
from webauthn_halo2_tpu.fields.ref_curve import BN254_G1_CURVE
from webauthn_halo2_tpu.ops import ec as E

import functools
import jax

jadd = jax.jit(functools.partial(E.add, E.BN254_CURVE))
jdouble = jax.jit(functools.partial(E.double, E.BN254_CURVE))


def rand_pts(n):
    return [BN254_G1_CURVE.random_point() for _ in range(n)]


def test_add_double_vs_oracle():
    n = 4
    ps, qs = rand_pts(n), rand_pts(n)
    P = E.from_affine_ints(E.BN254_CURVE, ps)
    Q = E.from_affine_ints(E.BN254_CURVE, qs)
    got = E.to_affine_ints(E.BN254_CURVE, jadd(P, Q))
    want = [BN254_G1_CURVE.add(p, q) for p, q in zip(ps, qs)]
    assert got == want

    got2 = E.to_affine_ints(E.BN254_CURVE, jdouble(P))
    want2 = [BN254_G1_CURVE.add(p, p) for p in ps]
    assert got2 == want2

    assert bool(np.all(np.asarray(E.is_on_curve(E.BN254_CURVE, P))))


def test_degenerate_cases():
    p0 = rand_pts(1)[0]
    pts = [p0, p0, None, p0]
    qts = [p0, BN254_G1_CURVE.neg(p0), p0, None]
    P = E.from_affine_ints(E.BN254_CURVE, pts)
    Q = E.from_affine_ints(E.BN254_CURVE, qts)
    got = E.to_affine_ints(E.BN254_CURVE, jadd(P, Q))
    want = [BN254_G1_CURVE.add(a, b) for a, b in zip(pts, qts)]
    assert got == want  # [2P, inf, P, P]


def test_scalar_mul():
    pts = rand_pts(2)
    ks = [secrets.randbelow(BN254_FR) for _ in pts]
    nbits = 256
    bits = np.zeros((nbits, len(pts)), dtype=np.int32)
    for j, k in enumerate(ks):
        for i in range(nbits):
            bits[i, j] = (k >> i) & 1
    P = E.from_affine_ints(E.BN254_CURVE, pts)
    got = E.to_affine_ints(
        E.BN254_CURVE, E.scalar_mul(E.BN254_CURVE, jnp.asarray(bits), P)
    )
    want = [BN254_G1_CURVE.mul(k, p) for k, p in zip(ks, pts)]
    assert got == want
