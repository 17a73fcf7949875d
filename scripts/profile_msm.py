#!/usr/bin/env python
"""Anchored stage-by-stage profile of the fused-Pallas MSM (round-4 #1).

Splits ops/msm_pallas._msm_pallas_single into its pipeline stages, jits
each separately, and times each with a REAL np.asarray pull of (a tiny
slice of) its outputs — block_until_ready is not trustworthy on the
tunneled axon backend (results/ROUND3.md). Stage boundaries:

  A digits+sort   scalars -> (sorted digits, order)        [XLA sort]
  B gather        points coords gathered by order          [XLA gather]
  C interior      Pallas run-accumulation kernel
  D post          searchsorted/fill/boundary-merge/scatter [XLA soup]
  E combine       Pallas bucket-combine kernel
  F horner        window Horner reduction

plus the fused single-graph end-to-end for reference. First run pays
one remote compile per stage graph (AOT-cached under artifacts/aot).
"""
import os
import sys
import time

os.environ.setdefault("WH2_TRACE", "1")
os.environ.setdefault(
    "WH2_SRS_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "artifacts"),
)

import functools  # noqa: E402
import secrets  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webauthn_halo2_tpu.fields.limbs import FR_SPEC, L  # noqa: E402
from webauthn_halo2_tpu.ops import ec as E  # noqa: E402
from webauthn_halo2_tpu.ops import modops as M  # noqa: E402
from webauthn_halo2_tpu.ops import msm_pallas as MP  # noqa: E402
from webauthn_halo2_tpu.ops.msm import scalar_digits  # noqa: E402
from webauthn_halo2_tpu.plonk.srs import get_srs  # noqa: E402
from webauthn_halo2_tpu.utils.aot_cache import aot_wrap  # noqa: E402

K_DEG = int(os.environ.get("WH2_BENCH_K", "17"))
N = 1 << K_DEG
C_BITS = 13
KL = MP.DEFAULT_K_LANES
S = N // KL
NB = 1 << C_BITS
G = min(MP.COMBINE_G, NB)
M_CH = NB // G

curve = E.BN254_CURVE
f_q = curve.field
f_r = FR_SPEC


def pull(x):
    """Anchor: tiny dependent D2H — slice ON DEVICE first (the tunnel
    moves D2H at ~16-30 MB/s; pulling a full array times the download,
    not the compute)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    sl = leaf[tuple(slice(s - 1, s) for s in leaf.shape)]
    return np.asarray(sl)


def pull_all(tree):
    for leaf in jax.tree_util.tree_leaves(tree):
        sl = leaf[tuple(slice(s - 1, s) for s in leaf.shape)]
        np.asarray(sl)


# --- stage graphs (bodies lifted from _msm_pallas_single) -----------------

@jax.jit
def stage_a(scalars_mont):
    std = M.normalize(f_r, M.from_mont(f_r, scalars_mont))
    digits = scalar_digits(std, C_BITS)  # (W, n)
    idx = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[None], digits.shape)
    sdig, order = jax.lax.sort((digits, idx), dimension=1, num_keys=1)
    return sdig, order


@jax.jit
def stage_b(px_full, py_full, sdig, order):
    R_ = sdig.shape[0]

    def gat(coord):
        g = coord[:, order]
        g = jnp.moveaxis(g, 1, 0)
        return jnp.transpose(g.reshape(R_, L, KL, S), (0, 3, 1, 2))

    px = gat(px_full)
    py = gat(py_full)
    digs = jnp.transpose(sdig.reshape(R_, 1, KL, S), (0, 3, 1, 2))
    return px, py, digs


def stage_c(px, py, digs):
    return MP._interior(f_q, px, py, digs, False)


@jax.jit
def stage_d(ex, ey, ez, labs4, acx, acy, acz, cur, fx, fy, fz, fdig, hasf):
    R_ = ex.shape[0]

    def lm(e):
        return jnp.transpose(e, (0, 2, 3, 1)).reshape(R_, L, N)

    ex, ey, ez = lm(ex), lm(ey), lm(ez)
    labs = jnp.transpose(labs4, (0, 2, 3, 1)).reshape(R_, N)
    targets = jnp.arange(NB, dtype=jnp.int32)
    pos = jax.vmap(
        lambda lr: jnp.searchsorted(lr, targets, side="right").astype(
            jnp.int32)
    )(labs) - 1
    pos = jnp.maximum(pos, 0)
    hit = jnp.take_along_axis(labs, pos, axis=1) == targets[None]

    def fill(e):
        return jnp.take_along_axis(
            e, jnp.broadcast_to(pos[:, None, :], (R_, L, NB)), axis=2)

    one_col = jnp.asarray(
        np.asarray(f_q.one_mont).reshape(1, L, 1), jnp.int32)
    bx = jnp.where(hit[:, None, :], fill(ex), one_col)
    by = jnp.where(hit[:, None, :], fill(ey), one_col)
    bz = jnp.where(hit[:, None, :], fill(ez), 0)

    hasf_b = hasf[:, 0, :] > 0
    a_dig = jnp.where(hasf_b, fdig[:, 0, :], cur[:, 0, :])
    inf_xy = jnp.broadcast_to(one_col, (R_, L, KL))
    a_x = jnp.where(hasf_b[:, None, :], fx, inf_xy)
    a_y = jnp.where(hasf_b[:, None, :], fy, inf_xy)
    a_z = jnp.where(hasf_b[:, None, :], fz, 0)
    seg = jnp.stack([a_dig, cur[:, 0, :]], axis=2).reshape(R_, 2 * KL)
    from webauthn_halo2_tpu.ops.msm import _prefix_scan_points

    bnd = E.JPoint(
        jnp.stack([a_x, acx], axis=3).reshape(R_, L, 2 * KL),
        jnp.stack([a_y, acy], axis=3).reshape(R_, L, 2 * KL),
        jnp.stack([a_z, acz], axis=3).reshape(R_, L, 2 * KL),
    )
    merged = jax.vmap(
        lambda p_x, p_y, p_z, s: _prefix_scan_points(
            curve, E.JPoint(p_x, p_y, p_z), s)
    )(bnd.x, bnd.y, bnd.z, seg)
    is_tail = jnp.concatenate(
        [seg[:, :-1] != seg[:, 1:], jnp.ones((R_, 1), bool)], axis=1)
    target = jnp.where(is_tail, seg, NB)

    def scat(b, vals):
        return jax.vmap(
            lambda bb, tt, vv: bb.at[:, tt].set(vv, mode="drop")
        )(b, target, vals)

    bx = scat(bx, merged.x)
    by = scat(by, merged.y)
    bz = scat(bz, merged.z)

    def to_mg(b):
        return jnp.transpose(b.reshape(R_, L, G, M_CH), (0, 3, 1, 2))

    return to_mg(bx), to_mg(by), to_mg(bz)


def stage_e(bx, by, bz):
    return MP._combine(f_q, bx, by, bz, False)


@jax.jit
def stage_f(wx, wy, wz):
    R_ = wx.shape[0]
    W = R_
    wsum = E.JPoint(wx[..., :1], wy[..., :1], wz[..., :1])
    ws = E.JPoint(
        wsum.x.reshape(1, W, L), wsum.y.reshape(1, W, L),
        wsum.z.reshape(1, W, L),
    )

    def horner(i, acc):
        w = W - 2 - i
        s = E.JPoint(
            jnp.moveaxis(
                jax.lax.dynamic_index_in_dim(ws.x, w, 1, False), 0, 1),
            jnp.moveaxis(
                jax.lax.dynamic_index_in_dim(ws.y, w, 1, False), 0, 1),
            jnp.moveaxis(
                jax.lax.dynamic_index_in_dim(ws.z, w, 1, False), 0, 1),
        )
        for _ in range(C_BITS):
            acc = E.double(curve, acc)
        return E.add_unsafe(curve, acc, s)

    top = E.JPoint(ws.x[:, W - 1].T, ws.y[:, W - 1].T, ws.z[:, W - 1].T)
    return jax.lax.fori_loop(0, W - 1, horner, top)


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    pull_all(out)  # warm + anchor
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        pull(out)  # tiny dependent slice pull
        ts.append(time.time() - t0)
    ts.sort()
    print(f"[stage] {name:12s} med={ts[len(ts)//2]*1e3:9.1f} ms "
          f"min={ts[0]*1e3:9.1f} ms", flush=True)
    return out


def main():
    print(f"devices: {jax.devices()}", flush=True)
    srs = get_srs(K_DEG)
    pts = srs.g_lag
    sc_ints = [secrets.randbelow(f_r.p) for _ in range(N)]
    sc = jnp.asarray(f_r.encode(sc_ints))
    pull(sc)

    a_w = aot_wrap("prof_a", stage_a)
    b_w = aot_wrap("prof_b", stage_b)
    d_w = aot_wrap("prof_d", stage_d)
    f_w = aot_wrap("prof_f", stage_f)

    t_all0 = time.time()
    sdig, order = timed("A sort", a_w, sc)
    px, py, digs = timed("B gather", b_w, pts.x, pts.y, sdig, order)
    cout = timed("C interior", stage_c, px, py, digs)
    bx, by, bz = timed("D post", d_w, *cout)
    wx, wy, wz = timed("E combine", stage_e, bx, by, bz)
    res = timed("F horner", f_w, wx, wy, wz)
    print(f"[stage] total stage walltime ctx: {time.time()-t_all0:.1f}s",
          flush=True)

    # fused single-graph reference (the production path)
    def fused():
        r = MP._msm_single_aot(curve, pts, sc, C_BITS, KL, False)
        return r

    out = fused()
    pull_all(out)
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fused()
        pull(out.x); pull(out.y); pull(out.z)
        ts.append(time.time() - t0)
    ts.sort()
    print(f"[stage] fused e2e    med={ts[1]*1e3:9.1f} ms", flush=True)

    # correctness: stage pipeline result == fused result
    ax = np.asarray(M.normalize(f_q, M.from_mont(f_q, res.x)))
    fx = np.asarray(M.normalize(f_q, M.from_mont(f_q, out.x)))
    print("stage==fused x:", bool((ax == fx).all()), flush=True)


if __name__ == "__main__":
    main()
