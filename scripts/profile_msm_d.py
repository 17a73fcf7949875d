#!/usr/bin/env python
"""Sub-profile of MSM stage D (the 651 ms XLA post-stage):
  D1 lm transposes + labels + searchsorted + fill gathers
  D2 boundary prefix-scan (_prefix_scan_points over (R, 2K))
  D3 scatter of merged tails into buckets + to_mg relayout
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

import secrets  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webauthn_halo2_tpu.fields.limbs import FR_SPEC, L  # noqa: E402
from webauthn_halo2_tpu.ops import ec as E  # noqa: E402
from webauthn_halo2_tpu.ops import msm_pallas as MP  # noqa: E402
from webauthn_halo2_tpu.ops.msm import scalar_digits  # noqa: E402
from webauthn_halo2_tpu.plonk.srs import get_srs  # noqa: E402
from webauthn_halo2_tpu.utils.aot_cache import aot_wrap  # noqa: E402

K_DEG = 17
N = 1 << K_DEG
C_BITS = 13
KL = MP.DEFAULT_K_LANES
S = N // KL
NB = 1 << C_BITS
G = min(MP.COMBINE_G, NB)
M_CH = NB // G
curve = E.BN254_CURVE
f_q = curve.field


def pull(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf[tuple(slice(s - 1, s) for s in leaf.shape)])


def pull_all(tree):
    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(leaf[tuple(slice(s - 1, s) for s in leaf.shape)])


@jax.jit
def d1(ex, ey, ez, labs4):
    R_ = ex.shape[0]

    def lm(e):
        return jnp.transpose(e, (0, 2, 3, 1)).reshape(R_, L, N)

    ex, ey, ez = lm(ex), lm(ey), lm(ez)
    labs = jnp.transpose(labs4, (0, 2, 3, 1)).reshape(R_, N)
    targets = jnp.arange(NB, dtype=jnp.int32)
    pos = jax.vmap(
        lambda lr: jnp.searchsorted(lr, targets, side="right").astype(
            jnp.int32))(labs) - 1
    pos = jnp.maximum(pos, 0)
    hit = jnp.take_along_axis(labs, pos, axis=1) == targets[None]

    def fill(e):
        return jnp.take_along_axis(
            e, jnp.broadcast_to(pos[:, None, :], (R_, L, NB)), axis=2)

    one_col = jnp.asarray(np.asarray(f_q.one_mont).reshape(1, L, 1),
                          jnp.int32)
    bx = jnp.where(hit[:, None, :], fill(ex), one_col)
    by = jnp.where(hit[:, None, :], fill(ey), one_col)
    bz = jnp.where(hit[:, None, :], fill(ez), 0)
    return bx, by, bz


@jax.jit
def d2(acx, acy, acz, cur, fx, fy, fz, fdig, hasf):
    R_ = acx.shape[0]
    one_col = jnp.asarray(np.asarray(f_q.one_mont).reshape(1, L, 1),
                          jnp.int32)
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
    return merged.x, merged.y, merged.z, target


@jax.jit
def d3(bx, by, bz, mx, my, mz, target):
    R_ = bx.shape[0]

    def scat(b, vals):
        return jax.vmap(
            lambda bb, tt, vv: bb.at[:, tt].set(vv, mode="drop")
        )(b, target, vals)

    bx = scat(bx, mx)
    by = scat(by, my)
    bz = scat(bz, mz)

    def to_mg(b):
        return jnp.transpose(b.reshape(R_, L, G, M_CH), (0, 3, 1, 2))

    return to_mg(bx), to_mg(by), to_mg(bz)


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    pull_all(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        pull(out)
        ts.append(time.time() - t0)
    ts.sort()
    print(f"[substage] {name:10s} med={ts[len(ts)//2]*1e3:8.1f} ms",
          flush=True)
    return out


def main():
    print(f"devices: {jax.devices()}", flush=True)
    srs = get_srs(K_DEG)
    sc = jnp.asarray(FR_SPEC.encode(
        [secrets.randbelow(FR_SPEC.p) for _ in range(N)]))

    # reuse the cached stage graphs from profile_msm.py for inputs
    from profile_msm import stage_a, stage_b, stage_c

    a_w = aot_wrap("prof_a", stage_a)
    b_w = aot_wrap("prof_b", stage_b)
    sdig, order = a_w(sc)
    px, py, digs = b_w(srs.g_lag.x, srs.g_lag.y, sdig, order)
    cout = stage_c(px, py, digs)
    pull_all(cout)
    (ex, ey, ez, labs, acx, acy, acz, cur, fx, fy, fz, fdig, hasf) = cout

    d1w = aot_wrap("prof_d1", d1)
    d2w = aot_wrap("prof_d2", d2)
    d3w = aot_wrap("prof_d3", d3)
    b3 = timed("D1 fill", d1w, ex, ey, ez, labs)
    m4 = timed("D2 scan", d2w, acx, acy, acz, cur, fx, fy, fz, fdig, hasf)
    timed("D3 scatter", d3w, *b3, *m4)

    # --- D1 split: transposes vs searchsorted vs fill gathers -----------
    R_ = ex.shape[0]

    @jax.jit
    def d1a(ex, ey, ez, labs4):
        def lm(e):
            return jnp.transpose(e, (0, 2, 3, 1)).reshape(R_, L, N)

        return lm(ex), lm(ey), lm(ez), jnp.transpose(
            labs4, (0, 2, 3, 1)).reshape(R_, N)

    @jax.jit
    def d1b(labs):
        targets = jnp.arange(NB, dtype=jnp.int32)
        pos = jax.vmap(
            lambda lr: jnp.searchsorted(lr, targets, side="right").astype(
                jnp.int32))(labs) - 1
        pos = jnp.maximum(pos, 0)
        hit = jnp.take_along_axis(labs, pos, axis=1) == targets[None]
        return pos, hit

    @jax.jit
    def d1c(exl, eyl, ezl, pos, hit):
        def fill(e):
            return jnp.take_along_axis(
                e, jnp.broadcast_to(pos[:, None, :], (R_, L, NB)), axis=2)

        one_col = jnp.asarray(np.asarray(f_q.one_mont).reshape(1, L, 1),
                              jnp.int32)
        bx = jnp.where(hit[:, None, :], fill(exl), one_col)
        by = jnp.where(hit[:, None, :], fill(eyl), one_col)
        bz = jnp.where(hit[:, None, :], fill(ezl), 0)
        return bx, by, bz

    a_w = aot_wrap("prof_d1a", d1a)
    b_w = aot_wrap("prof_d1b", d1b)
    c_w = aot_wrap("prof_d1c", d1c)
    exl, eyl, ezl, labsf = timed("D1a transpose", a_w, ex, ey, ez, labs)
    pos, hit = timed("D1b search", b_w, labsf)
    timed("D1c fillgather", c_w, exl, eyl, ezl, pos, hit)


if __name__ == "__main__":
    main()
