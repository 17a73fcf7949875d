"""Multi-chip sharding on the 8-device virtual CPU mesh (SURVEY §2.3/§5.8):
sharded results must be bit-identical to single-chip."""
import secrets

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webauthn_halo2_tpu.fields.constants import BN254_FR
from webauthn_halo2_tpu.fields.limbs import FR_SPEC
from webauthn_halo2_tpu.fields.ref_curve import BN254_G1_CURVE
from webauthn_halo2_tpu.ops import ec as E
from webauthn_halo2_tpu.ops import ntt as N
from webauthn_halo2_tpu.ops.msm import msm
from webauthn_halo2_tpu.parallel.sharded import (
    batch_commit,
    make_mesh,
    sharded_msm,
    sharded_ntt,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_ntt_matches_single_chip(mesh):
    k = 9
    n = 1 << k
    coeffs = [secrets.randbelow(BN254_FR) for _ in range(n)]
    a = jnp.asarray(FR_SPEC.encode(coeffs))
    single = N.ntt(FR_SPEC, a, k)
    multi = sharded_ntt(mesh, a, k)
    assert FR_SPEC.decode(np.asarray(multi)) == FR_SPEC.decode(np.asarray(single))


def test_sharded_intt_matches_single_chip(mesh):
    k = 9
    n = 1 << k
    evals = [secrets.randbelow(BN254_FR) for _ in range(n)]
    a = jnp.asarray(FR_SPEC.encode(evals))
    single = N.intt(FR_SPEC, a, k)
    from webauthn_halo2_tpu.parallel.sharded import sharded_intt

    multi = sharded_intt(mesh, a, k)
    assert FR_SPEC.decode(np.asarray(multi)) == FR_SPEC.decode(np.asarray(single))


def test_sharded_coeff_to_extended_matches_domain(mesh):
    from webauthn_halo2_tpu.parallel.sharded import sharded_coeff_to_extended
    from webauthn_halo2_tpu.plonk.domain import Domain

    k, ext_k = 7, 9
    n = 1 << k
    coeffs = [secrets.randbelow(BN254_FR) for _ in range(n)]
    a = jnp.asarray(FR_SPEC.encode(coeffs))
    dom = Domain(k, ext_k)
    single = dom.coeff_to_extended(a)
    multi = sharded_coeff_to_extended(mesh, a, k, ext_k)
    assert FR_SPEC.decode(np.asarray(multi)) == FR_SPEC.decode(np.asarray(single))


def test_sharded_msm_matches_single_chip(mesh):
    n = 64
    pts = [BN254_G1_CURVE.random_point() for _ in range(n)]
    ks = [secrets.randbelow(BN254_FR) for _ in range(n)]
    P = E.from_affine_ints(E.BN254_CURVE, pts)
    sc = jnp.asarray(FR_SPEC.encode(ks))
    single = E.to_affine_ints(E.BN254_CURVE, msm(E.BN254_CURVE, P, sc))[0]
    multi = E.to_affine_ints(E.BN254_CURVE, sharded_msm(mesh, P, sc, c=4))[0]
    assert single == multi


def test_batch_commit_dp(mesh):
    n, B = 32, 8
    pts = [BN254_G1_CURVE.random_point() for _ in range(n)]
    P = E.from_affine_ints(E.BN254_CURVE, pts)
    cols = []
    expect = []
    for _ in range(B):
        ks = [secrets.randbelow(BN254_FR) for _ in range(n)]
        cols.append(np.asarray(FR_SPEC.encode(ks)))
        acc = None
        for p_, k_ in zip(pts, ks):
            acc = BN254_G1_CURVE.add(acc, BN254_G1_CURVE.mul(k_, p_))
        expect.append(acc)
    res = batch_commit(mesh, P, jnp.asarray(np.stack(cols)))
    got = E.to_affine_ints(E.BN254_CURVE, res)
    assert got == expect
