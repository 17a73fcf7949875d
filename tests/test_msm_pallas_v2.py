"""v2 fused-Pallas MSM engine (list-form limbs, packed gather) conformance.

Layered: (1) the v2 interior kernel is bit-exact vs the v1 interior on a
fabricated sorted stream (fast, interpret mode); (2) the full v2 single-MSM
driver matches the host curve oracle (slow, interpret mode)."""
import jax.numpy as jnp
import numpy as np
import pytest

from webauthn_halo2_tpu.fields.limbs import FQ_SPEC, FR_SPEC, L
from webauthn_halo2_tpu.fields.ref_curve import BN254_G1_CURVE
from webauthn_halo2_tpu.ops import ec as E
from webauthn_halo2_tpu.ops import limbvec as V
from webauthn_halo2_tpu.ops import msm_pallas as MP

_rng = np.random.default_rng(77)


def _points(n):
    ints = [BN254_G1_CURVE.mul(int(s), BN254_G1_CURVE.g)
            for s in _rng.integers(1, 1 << 62, size=n)]
    return ints, E.from_affine_ints(E.BN254_CURVE, ints)


def test_interior_v2_matches_v1():
    R, S, K = 2, 4, 16
    SUB = MP.V2_SUB
    LN = K // SUB
    n = S * K
    _, pts = _points(n)
    # per-lane non-decreasing digit streams (the sorted-stream contract)
    digs_np = np.sort(_rng.integers(0, 6, size=(R, K, S)), axis=2)
    # lane k's stream occupies sorted positions [k*S, (k+1)*S)
    px = np.asarray(pts.x).reshape(L, K, S)
    py = np.asarray(pts.y).reshape(L, K, S)

    def v1_in(coord):  # (L, K, S) -> (R, S, L, K)
        t = np.broadcast_to(coord[None], (R, L, K, S))
        return jnp.asarray(np.transpose(t, (0, 3, 1, 2)).copy())

    px1, py1 = v1_in(px), v1_in(py)
    d1 = jnp.asarray(np.transpose(digs_np[:, None], (0, 3, 1, 2)).copy())

    o1 = MP._interior(FQ_SPEC, px1, py1, d1, True)

    pxw = V.pack_words_host(np.asarray(pts.x))  # (NW, n)
    pyw = V.pack_words_host(np.asarray(pts.y))

    def v2_in(wds):  # (NW, n) with n = K*S lane-major -> (R,S,NW,SUB,LN)
        t = wds.reshape(V.NW, K, S)
        t = np.broadcast_to(t[None], (R, V.NW, K, S))
        t = np.transpose(t, (0, 3, 1, 2)).reshape(R, S, V.NW, SUB, LN)
        return jnp.asarray(t.copy())

    d2 = jnp.asarray(
        np.transpose(digs_np[:, None], (0, 3, 1, 2))
        .reshape(R, S, 1, SUB, LN).copy())

    o2 = MP._interior_v2(FQ_SPEC, v2_in(pxw), v2_in(pyw), d2, True)
    o2 = [np.asarray(o).reshape(np.asarray(a).shape)
          for o, a in zip(o2, o1)]
    names = ["ex", "ey", "ez", "labs", "acx", "acy", "acz", "cur",
             "fx", "fy", "fz", "fdig", "hasf"]
    for nm, a, b in zip(names, o1, o2):
        assert (np.asarray(a) == b).all(), f"mismatch in {nm}"


def _host_msm(scalars, pts_int):
    acc = None
    for s, p in zip(scalars, pts_int):
        if s % FR_SPEC.p == 0:
            continue
        t = BN254_G1_CURVE.mul(s % FR_SPEC.p, p)
        acc = t if acc is None else BN254_G1_CURVE.add(acc, t)
    return acc


@pytest.mark.slow
def test_v2_full_driver_vs_host():
    n, K, c = 64, 16, 8
    pts_int, pts = _points(n)
    scalars = [int.from_bytes(_rng.bytes(32), "little") % FR_SPEC.p
               for _ in range(n)]
    sc = jnp.asarray(FR_SPEC.encode(scalars))
    got = MP._msm_pallas_single_v2(E.BN254_CURVE, pts, sc, c, K, True)
    got_aff = E.to_affine_ints(E.BN254_CURVE, got)
    assert got_aff[0] == _host_msm(scalars, pts_int)
