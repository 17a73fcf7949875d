"""Fused-Pallas MSM engine conformance (interpret mode on CPU).

Validates ops/msm_pallas.py bit-exactly against the host curve oracle at
small sizes, covering the degenerate paths (zero scalars, repeated digits,
single-chunk and multi-chunk bucket combines). The real-TPU compiled path
is exercised by bench.py / scripts/microbench.py.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from webauthn_halo2_tpu.fields.limbs import FR_SPEC
from webauthn_halo2_tpu.fields.ref_curve import BN254_G1_CURVE
from webauthn_halo2_tpu.ops import ec as E
from webauthn_halo2_tpu.ops import msm_pallas as MP

N = 256
K = 128
_rng = np.random.default_rng(1234)
_pts_int = [
    BN254_G1_CURVE.mul(int(s), BN254_G1_CURVE.g)
    for s in _rng.integers(1, 1 << 62, size=N)
]
_pts = E.from_affine_ints(E.BN254_CURVE, _pts_int)


def _host_msm(scalars):
    acc = None
    for s, p in zip(scalars, _pts_int):
        if s % FR_SPEC.p == 0:
            continue
        t = BN254_G1_CURVE.mul(s % FR_SPEC.p, p)
        acc = t if acc is None else BN254_G1_CURVE.add(acc, t)
    return acc


def _check(scal_batch, c):
    scb = jnp.stack([jnp.asarray(FR_SPEC.encode(s)) for s in scal_batch])
    got = MP.msm_pallas_batch(E.BN254_CURVE, _pts, scb, c, K, True)
    got_aff = E.to_affine_ints(E.BN254_CURVE, got)
    for bi, s in enumerate(scal_batch):
        assert _host_msm(s) == got_aff[bi]


def _rand_scalars():
    return [int.from_bytes(_rng.bytes(32), "little") % FR_SPEC.p
            for _ in range(N)]


@pytest.mark.slow
def test_single_random_c8():
    # ~25 min in interpret mode: the kernels execute op-by-op on CPU.
    # The compiled path is cross-checked bit-exactly against the XLA MSM
    # on the real TPU by scripts/tpu checks + bench.py.
    _check([_rand_scalars()], 8)  # nb=256 -> single chunk (m=1)


@pytest.mark.slow
def test_batch_multichunk_c10():
    _check([_rand_scalars(), _rand_scalars()], 10)  # nb=1024 -> m=2


@pytest.mark.slow
def test_degenerate_scalars():
    _check([[0, 1, 1, 2] * (N // 4)], 10)
    _check([[0] * N], 8)
    _check([[5] * N], 10)
