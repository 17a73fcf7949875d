"""Pippenger MSM vs host oracle."""
import secrets

from webauthn_halo2_tpu.fields.constants import BN254_FR
from webauthn_halo2_tpu.fields.ref_curve import BN254_G1_CURVE
from webauthn_halo2_tpu.ops import ec as E
from webauthn_halo2_tpu.ops.msm import msm_host


def oracle_msm(pts, ks):
    acc = None
    for p, k in zip(pts, ks):
        acc = BN254_G1_CURVE.add(acc, BN254_G1_CURVE.mul(k, p))
    return acc


def test_msm_small():
    n = 32
    pts = [BN254_G1_CURVE.random_point() for _ in range(n)]
    ks = [secrets.randbelow(BN254_FR) for _ in range(n)]
    # include edge scalars
    ks[0], ks[1], ks[2] = 0, 1, BN254_FR - 1
    # c=5 keeps the bucket-scan unroll small: this container's XLA:CPU
    # segfaults/stalls compiling the 2^9-bucket c=8 variant (the TPU path
    # uses the fused-Pallas engine, not this fallback)
    got = msm_host(E.BN254_CURVE, pts, ks, c=5)
    assert got == oracle_msm(pts, ks)


def test_msm_shared_buckets():
    # equal scalars put distinct points in the same bucket -> long runs
    # (points must be pairwise distinct: MSM precondition, as for SRS bases)
    pts = [BN254_G1_CURVE.random_point() for _ in range(8)]
    ks = [3] * 8
    got = msm_host(E.BN254_CURVE, pts, ks, c=4)
    assert got == oracle_msm(pts, ks)
