"""v2 fused-Pallas MSM engine (list-form limbs, packed gather) conformance.

The v2 kernel body fully unrolls the 33-limb list arithmetic (~30k ops),
which makes Pallas interpret mode unusable on CPU (minutes per grid
step) — so kernel-level checks here run COMPILED and are TPU-only; CPU CI
covers the same math through tests/test_limbvec.py (host-oracle checks of
the identical bodies). The v2 driver is additionally cross-checked
bit-exactly against the v1 driver + host oracle on TPU by
scripts/dev_msm_v2.py before being wired as the default commit path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webauthn_halo2_tpu.fields.limbs import FQ_SPEC, FR_SPEC, L
from webauthn_halo2_tpu.fields.ref_curve import BN254_G1_CURVE
from webauthn_halo2_tpu.ops import ec as E
from webauthn_halo2_tpu.ops import limbvec as V
from webauthn_halo2_tpu.ops import msm_pallas as MP

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="v2 kernels validate compiled on TPU (interpret mode is "
           "minutes/step for the unrolled limb lists; see module docstring)",
)

_rng = np.random.default_rng(77)


def _points(n):
    ints = [BN254_G1_CURVE.mul(int(s), BN254_G1_CURVE.g)
            for s in _rng.integers(1, 1 << 62, size=n)]
    return ints, E.from_affine_ints(E.BN254_CURVE, ints)


def test_interior_v2_matches_v1():
    R, S, K = 2, 4, 256
    SUB = MP.V2_SUB
    LN = K // SUB
    n = S * K
    _, pts = _points(n)
    digs_np = np.sort(_rng.integers(0, 6, size=(R, K, S)), axis=2)
    px = np.asarray(pts.x).reshape(L, K, S)
    py = np.asarray(pts.y).reshape(L, K, S)

    def v1_in(coord):  # (L, K, S) -> (R, S, L, K)
        t = np.broadcast_to(coord[None], (R, L, K, S))
        return jnp.asarray(np.transpose(t, (0, 3, 1, 2)).copy())

    d1 = jnp.asarray(np.transpose(digs_np[:, None], (0, 3, 1, 2)).copy())
    o1 = MP._interior(FQ_SPEC, v1_in(px), v1_in(py), d1, False)

    pxw = V.pack_words_host(np.asarray(pts.x))
    pyw = V.pack_words_host(np.asarray(pts.y))

    def v2_in(wds):
        t = wds.reshape(V.NW, K, S)
        t = np.broadcast_to(t[None], (R, V.NW, K, S))
        t = np.transpose(t, (0, 3, 1, 2)).reshape(R, S, V.NW, SUB, LN)
        return jnp.asarray(t.copy())

    d2 = jnp.asarray(
        np.transpose(digs_np[:, None], (0, 3, 1, 2))
        .reshape(R, S, 1, SUB, LN).copy())

    o2 = MP._interior_v2(FQ_SPEC, v2_in(pxw), v2_in(pyw), d2, False)

    def unpack_host(w, axis):
        """numpy inverse of limbvec.pack16 along the given limb axis."""
        w = np.moveaxis(np.asarray(w), axis, 0).astype(np.int64)
        rows = []
        for i in range(L // 2):
            rows.append(w[i] & 0xFFFF)
            rows.append(w[i] >> 16)
        rows.append(w[L // 2])
        return np.moveaxis(np.stack(rows), 0, axis).astype(np.int32)

    packed = {0: 2, 1: 2, 2: 2, 4: 1, 5: 1, 6: 1, 8: 1, 9: 1, 10: 1}
    names = ["ex", "ey", "ez", "labs", "acx", "acy", "acz", "cur",
             "fx", "fy", "fz", "fdig", "hasf"]
    for idx, (nm, a, b) in enumerate(zip(names, o1, o2)):
        got = np.asarray(b)
        if idx in packed:
            got = unpack_host(got, packed[idx])
        got = got.reshape(np.asarray(a).shape)
        assert (np.asarray(a) == got).all(), f"mismatch in {nm}"
