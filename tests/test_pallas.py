"""Pallas kernels vs the XLA reference path (interpret mode on CPU)."""
import secrets

import jax.numpy as jnp
import numpy as np

from webauthn_halo2_tpu.fields.limbs import FQ_SPEC, FR_SPEC
from webauthn_halo2_tpu.fields.ref_curve import BN254_G1_CURVE
from webauthn_halo2_tpu.ops import ec as E
from webauthn_halo2_tpu.ops.pallas_kernels import (
    BLOCK,
    ec_add_unsafe_pallas,
    montmul_pallas,
)


def test_montmul_pallas_matches():
    n = BLOCK
    xs = [secrets.randbelow(FR_SPEC.p) for _ in range(n)]
    ys = [secrets.randbelow(FR_SPEC.p) for _ in range(n)]
    a = jnp.asarray(FR_SPEC.encode(xs))
    b = jnp.asarray(FR_SPEC.encode(ys))
    got = FR_SPEC.decode(np.asarray(montmul_pallas(FR_SPEC, a, b)))
    assert got == [x * y % FR_SPEC.p for x, y in zip(xs, ys)]


def test_ec_add_pallas_matches():
    n = BLOCK
    ps = [BN254_G1_CURVE.random_point() for _ in range(4)]
    qs = [BN254_G1_CURVE.random_point() for _ in range(4)]
    # tile the 4 distinct pairs across the block (plus infinity cases)
    pts1 = (ps * (n // 4))[:n]
    pts2 = (qs * (n // 4))[:n]
    pts1[1] = None  # inf + Q = Q
    pts2[2] = None  # P + inf = P
    P1 = E.from_affine_ints(E.BN254_CURVE, pts1)
    P2 = E.from_affine_ints(E.BN254_CURVE, pts2)
    x, y, z = ec_add_unsafe_pallas(
        FQ_SPEC, (P1.x, P1.y, P1.z), (P2.x, P2.y, P2.z)
    )
    got = E.to_affine_ints(E.BN254_CURVE, E.JPoint(x, y, z))[:8]
    want = [BN254_G1_CURVE.add(a, b) for a, b in zip(pts1[:8], pts2[:8])]
    assert got == want
