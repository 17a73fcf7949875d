"""Fused-Pallas Pippenger MSM engine (the TPU speed-of-light commit path).

Replaces the hot interior of ops/msm.py (which drove ~100s of the 147s
round-1 k=17 proof) with two TPU kernels that keep all CIOS Montgomery
intermediates and the Pippenger run-accumulation state in VMEM:

  kernel 1 (`_interior_kernel`): walks the digit-sorted point stream in
    K-lane chunks (grid = (rows, S) where rows = batch*windows). Per step
    each lane does ONE mixed Jacobian+affine add (11 montmuls — SRS points
    are affine, z==1) against a VMEM-resident accumulator, and emits
    completed runs densely to HBM labeled by digit. Because the stream is
    sorted, per-lane emitted labels are non-decreasing, so bucket values
    are recovered OUTSIDE the kernel with one searchsorted + gather — no
    scatter anywhere on the hot path (Mosaic has no scatter).

  kernel 2 (`_combine_kernel`): turns the (nb,) bucket array into
    sum_b b*B_b entirely in VMEM using the decomposition
        sum_b b*B_b = m * sum_{g>=1} E'_g  +  sum_g W_g
    over an (m, G) chunking of buckets (b = g*m + i), where E' is the
    cross-chunk inclusive suffix of chunk totals and W_g the within-chunk
    weighted sum. Nested-partial sums use a COMPLETE add (suffix partials
    repeat exactly across empty buckets); disjoint-subset sums use the
    cheap infinity-aware unsafe add (a value collision would exhibit a
    linear relation among fixed SRS points — cryptographically negligible;
    see ops/msm.py header).

Reference parity: this computes the same commitments `halo2_proofs`'
create_proof gets from its rayon MSM (SURVEY §2.2/§3.2); bit-exactness is
asserted against the XLA path and the host oracle in tests/test_msm.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limbs import B as LIMB_B
from ..fields.limbs import L, MASK, FieldSpec
from . import ec as E
from . import modops as M
from .ec import CurveSpec, JPoint
from .pallas_kernels import _carry_round_body, _montmul_body

DEFAULT_K_LANES = 2048
COMBINE_G = 512  # lanes of the bucket-combine kernel


# ---------------------------------------------------------------------------
# shared in-kernel field helpers (operate on register/VMEM-resident values)
# ---------------------------------------------------------------------------

def _lazy_reduce_body(acc, c256):
    for _ in range(2):
        acc = _carry_round_body(acc)
    h = acc[L - 1]
    acc = jnp.concatenate([acc[: L - 1], jnp.zeros_like(acc[:1])], axis=0)
    acc = acc + h * c256
    return _carry_round_body(acc)


def _sub_body(a, b, pad, c256):
    return _lazy_reduce_body(a + pad - b, c256)


def _is_zero_body(spec: FieldSpec, a, p_col, c256):
    """Exact zero test mod p of a lazy value (modops.is_zero parity).

    REDC by 1 maps the class to < 2p, an exact 33-step carry normalizes,
    then only 0 and p represent zero.
    """
    one = jnp.zeros_like(a)
    one = jnp.concatenate([one[:1] + 1, one[1:]], axis=0)
    t = _montmul_body(spec, _lazy_reduce_body(a, c256), one, p_col)
    # exact carry: 33 sequential passes is overkill; two carry rounds leave
    # limbs < 256 except possible +1 trickle -- do a full serial propagate
    carry = jnp.zeros_like(t[0])
    rows = []
    for i in range(L):
        v = t[i] + carry
        rows.append(v & MASK)
        carry = v >> LIMB_B
    t = jnp.stack(rows)
    is0 = jnp.all(t == 0, axis=0)
    isp = jnp.all(t == p_col, axis=0)
    return is0 | isp


def _madd_body(spec, x1, y1, z1, x2, y2, p_col, pad, c256, one_col):
    """Mixed add: Jacobian (x1,y1,z1) + affine (x2,y2). No degenerate-case
    handling (P==+-Q, infinities) — callers select around those."""
    mm = lambda a, b: _montmul_body(spec, a, b, p_col)  # noqa: E731
    sb = lambda a, b: _sub_body(a, b, pad, c256)  # noqa: E731
    z1z1 = mm(z1, z1)
    u2 = mm(x2, z1z1)
    s2 = mm(y2, mm(z1, z1z1))
    h = sb(u2, x1)
    r = sb(s2, y1)
    hh = mm(h, h)
    hhh = mm(h, hh)
    v = mm(x1, hh)
    x3 = sb(sb(mm(r, r), hhh), _lazy_reduce_body(v * 2, c256))
    y3 = sb(mm(r, sb(v, x3)), mm(y1, hhh))
    z3 = mm(z1, h)
    return x3, y3, z3


def _jadd_unsafe_body(spec, p1, p2, p_col, pad, c256):
    """General Jacobian add, infinity-aware (literal-zero Z), unsafe for
    P==+-Q (callers guarantee disjoint-subset operands)."""
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    mm = lambda a, b: _montmul_body(spec, a, b, p_col)  # noqa: E731
    sb = lambda a, b: _sub_body(a, b, pad, c256)  # noqa: E731
    z1z1 = mm(z1, z1)
    z2z2 = mm(z2, z2)
    u1 = mm(x1, z2z2)
    u2 = mm(x2, z1z1)
    s1 = mm(y1, mm(z2, z2z2))
    s2 = mm(y2, mm(z1, z1z1))
    h = sb(u2, u1)
    r = sb(s2, s1)
    hh = mm(h, h)
    hhh = mm(h, hh)
    v = mm(u1, hh)
    x3 = sb(sb(mm(r, r), hhh), _lazy_reduce_body(v * 2, c256))
    y3 = sb(mm(r, sb(v, x3)), mm(s1, hhh))
    z3 = mm(mm(z1, z2), h)
    inf1 = jnp.all(z1 == 0, axis=0)[None]
    inf2 = jnp.all(z2 == 0, axis=0)[None]
    x3 = jnp.where(inf1, x2, jnp.where(inf2, x1, x3))
    y3 = jnp.where(inf1, y2, jnp.where(inf2, y1, y3))
    z3 = jnp.where(inf1, z2, jnp.where(inf2, z1, z3))
    return x3, y3, z3


def _jdouble_body(spec, p1, p_col, pad, c256):
    """Jacobian doubling (a=0 curves); correct at infinity and y=0."""
    x, y, z = p1
    mm = lambda a, b: _montmul_body(spec, a, b, p_col)  # noqa: E731
    sb = lambda a, b: _sub_body(a, b, pad, c256)  # noqa: E731
    lz = lambda a: _lazy_reduce_body(a, c256)  # noqa: E731
    a_ = mm(x, x)
    b_ = mm(y, y)
    c_ = mm(b_, b_)
    t = mm(lz(x + b_), lz(x + b_))
    d_ = lz((_sub_body(sb(t, a_), c_, pad, c256)) * 2)
    e_ = lz(a_ * 3)
    f_ = mm(e_, e_)
    x3 = sb(f_, lz(d_ * 2))
    y3 = sb(mm(e_, sb(d_, x3)), lz(c_ * 8))
    z3 = mm(lz(y * 2), z)
    return x3, y3, z3


def _jadd_complete_body(spec, p1, p2, p_col, pad, c256):
    """Fully complete Jacobian add: resolves P==Q (double) and P==-Q
    (infinity) in addition to infinities (ops/ec.py add parity)."""
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    mm = lambda a, b: _montmul_body(spec, a, b, p_col)  # noqa: E731
    sb = lambda a, b: _sub_body(a, b, pad, c256)  # noqa: E731
    z1z1 = mm(z1, z1)
    z2z2 = mm(z2, z2)
    u1 = mm(x1, z2z2)
    u2 = mm(x2, z1z1)
    s1 = mm(y1, mm(z2, z2z2))
    s2 = mm(y2, mm(z1, z1z1))
    h = sb(u2, u1)
    r = sb(s2, s1)
    h_zero = _is_zero_body(spec, h, p_col, c256)[None]
    r_zero = _is_zero_body(spec, r, p_col, c256)[None]
    hh = mm(h, h)
    hhh = mm(h, hh)
    v = mm(u1, hh)
    x3 = sb(sb(mm(r, r), hhh), _lazy_reduce_body(v * 2, c256))
    y3 = sb(mm(r, sb(v, x3)), mm(s1, hhh))
    z3 = mm(mm(z1, z2), h)
    dx, dy, dz = _jdouble_body(spec, p1, p_col, pad, c256)
    inf1 = jnp.all(z1 == 0, axis=0)[None]
    inf2 = jnp.all(z2 == 0, axis=0)[None]
    finite = (~inf1) & (~inf2)
    same = h_zero & r_zero & finite
    opposite = h_zero & (~r_zero) & finite
    x3 = jnp.where(same, dx, x3)
    y3 = jnp.where(same, dy, y3)
    z3 = jnp.where(same, dz, z3)
    # P == -Q -> infinity (z = 0); x/y values are then irrelevant
    z3 = jnp.where(opposite, jnp.zeros_like(z3), z3)
    x3 = jnp.where(inf1, x2, x3)
    y3 = jnp.where(inf1, y2, y3)
    z3 = jnp.where(inf1, z2, z3)
    x3 = jnp.where(inf2 & ~inf1, x1, x3)
    y3 = jnp.where(inf2 & ~inf1, y1, y3)
    z3 = jnp.where(inf2 & ~inf1, z1, z3)
    return x3, y3, z3


# ---------------------------------------------------------------------------
# kernel 1: interior run accumulation over the sorted stream
# ---------------------------------------------------------------------------

def _interior_kernel(spec, S, px_ref, py_ref, d_ref, p_ref, one_ref,
                     pad_ref, c256_ref,
                     ex_ref, ey_ref, ez_ref, lab_ref,
                     ax_ref, ay_ref, az_ref, cur_ref,
                     fx_ref, fy_ref, fz_ref, fdig_ref, hasf_ref):
    t = pl.program_id(1)
    px = px_ref[0, 0]          # (L, K) affine x of this step's points
    py = py_ref[0, 0]
    d = d_ref[0, 0]            # (1, K) digits
    p_col = p_ref[:, :]
    one = one_ref[:, :]
    pad = pad_ref[:, :]
    c256 = c256_ref[:, :]
    K = px.shape[1]
    one_b = jnp.broadcast_to(one, (L, K))

    @pl.when(t == 0)
    def _init():
        ax_ref[0] = px
        ay_ref[0] = py
        az_ref[0] = one_b
        cur_ref[0] = d
        hasf_ref[0] = jnp.zeros_like(d)
        fdig_ref[0] = jnp.zeros_like(d)
        fx_ref[0] = one_b
        fy_ref[0] = one_b
        fz_ref[0] = jnp.zeros_like(one_b)
        # emit slot: label = current digit, value = infinity (the first
        # run is routed through the boundary merge, never the emit stream)
        lab_ref[0, 0] = d
        ex_ref[0, 0] = one_b
        ey_ref[0, 0] = one_b
        ez_ref[0, 0] = jnp.zeros_like(one_b)

    @pl.when(t > 0)
    def _step():
        cur = cur_ref[0]       # (1, K)
        hasf = hasf_ref[0]
        acx, acy, acz = ax_ref[0], ay_ref[0], az_ref[0]
        new_run = d != cur
        emit_real = new_run & (hasf > 0)
        # labels: the digit whose run this step belongs to / just closed;
        # per-lane non-decreasing because the stream is digit-sorted
        lab_ref[0, 0] = cur
        ex_ref[0, 0] = jnp.where(emit_real, acx, one_b)
        ey_ref[0, 0] = jnp.where(emit_real, acy, one_b)
        ez_ref[0, 0] = jnp.where(emit_real, acz, jnp.zeros_like(acz))
        cap = new_run & (hasf == 0)
        fx_ref[0] = jnp.where(cap, acx, fx_ref[0])
        fy_ref[0] = jnp.where(cap, acy, fy_ref[0])
        fz_ref[0] = jnp.where(cap, acz, fz_ref[0])
        fdig_ref[0] = jnp.where(cap, cur, fdig_ref[0])
        hasf_ref[0] = hasf | new_run.astype(hasf.dtype)
        gx, gy, gz = _madd_body(
            spec, acx, acy, acz, px, py, p_col, pad, c256, one
        )
        ax_ref[0] = jnp.where(new_run, px, gx)
        ay_ref[0] = jnp.where(new_run, py, gy)
        az_ref[0] = jnp.where(new_run, one_b, gz)
        cur_ref[0] = d


@functools.partial(jax.jit, static_argnums=(0, 4))
def _interior(spec: FieldSpec, px, py, digs, interpret: bool):
    """px/py: (R, S, L, K) sorted affine coords; digs: (R, S, 1, K).

    Returns (emits xyz (R,S,L,K), labels (R,S,1,K), finals...).
    """
    R_, S, _, K = px.shape
    consts = [
        jnp.asarray(np.asarray(v).reshape(L, 1), jnp.int32)
        for v in (spec.p_limbs, spec.one_mont, spec.sub_pad, spec.c256_limbs)
    ]
    blk_pt = pl.BlockSpec((1, 1, L, K), lambda r, t: (r, t, 0, 0),
                          memory_space=pltpu.VMEM)
    blk_dig = pl.BlockSpec((1, 1, 1, K), lambda r, t: (r, t, 0, 0),
                           memory_space=pltpu.VMEM)
    blk_c = pl.BlockSpec((L, 1), lambda r, t: (0, 0), memory_space=pltpu.VMEM)
    blk_fin = pl.BlockSpec((1, L, K), lambda r, t: (r, 0, 0),
                           memory_space=pltpu.VMEM)
    blk_vec = pl.BlockSpec((1, 1, K), lambda r, t: (r, 0, 0),
                           memory_space=pltpu.VMEM)
    sds = jax.ShapeDtypeStruct
    out_shape = (
        sds((R_, S, L, K), jnp.int32),  # emit x
        sds((R_, S, L, K), jnp.int32),  # emit y
        sds((R_, S, L, K), jnp.int32),  # emit z
        sds((R_, S, 1, K), jnp.int32),  # labels
        sds((R_, L, K), jnp.int32),     # final acc x
        sds((R_, L, K), jnp.int32),
        sds((R_, L, K), jnp.int32),
        sds((R_, 1, K), jnp.int32),     # final cur
        sds((R_, L, K), jnp.int32),     # first sum x
        sds((R_, L, K), jnp.int32),
        sds((R_, L, K), jnp.int32),
        sds((R_, 1, K), jnp.int32),     # first dig
        sds((R_, 1, K), jnp.int32),     # has first
    )
    return pl.pallas_call(
        functools.partial(_interior_kernel, spec, S),
        out_shape=out_shape,
        grid=(R_, S),
        in_specs=[blk_pt, blk_pt, blk_dig] + [blk_c] * 4,
        out_specs=(blk_pt, blk_pt, blk_pt, blk_dig,
                   blk_fin, blk_fin, blk_fin, blk_vec,
                   blk_fin, blk_fin, blk_fin, blk_vec, blk_vec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(px, py, digs, *consts)


# ---------------------------------------------------------------------------
# kernel 1 v2: list-form limbs + packed-word inputs (round-4 speed path)
# ---------------------------------------------------------------------------
# Differences from _interior_kernel (see ops/limbvec.py header):
#   * field elements are Python lists of (SUB, LANES) tiles — the CIOS limb
#     shift is free list reindexing instead of a cross-sublane concatenate;
#   * points arrive as 8 packed uint32 words per coordinate (gather moves
#     8/33 of the data) and are unpacked with in-register shifts;
#   * modulus/pad constants are Python-int immediates (no const refs).

V2_SUB = 8  # sublane tile height; K lanes per step = V2_SUB * (K // V2_SUB)


def _interior_kernel_v2(consts, S, pxw_ref, pyw_ref, d_ref,
                        ex_ref, ey_ref, ez_ref, lab_ref,
                        ax_ref, ay_ref, az_ref, cur_ref,
                        fx_ref, fy_ref, fz_ref, fdig_ref, hasf_ref):
    from . import limbvec as V

    t = pl.program_id(1)
    d = d_ref[0, 0, 0]                       # (SUB, LN) digits
    px = V.unpack_words([pxw_ref[0, 0, w] for w in range(V.NW)])
    py = V.unpack_words([pyw_ref[0, 0, w] for w in range(V.NW)])
    one_l = [jnp.full_like(d, v) for v in consts["one"]]
    zero_l = [jnp.zeros_like(d) for _ in range(L)]

    def read_pt(xr, yr, zr):
        return (V.unpack16([xr[0, i] for i in range(V.PW)]),
                V.unpack16([yr[0, i] for i in range(V.PW)]),
                V.unpack16([zr[0, i] for i in range(V.PW)]))

    def write_pt(xr, yr, zr, p):
        # state blocks stay packed in HBM (PW words); unpack on read
        for i, (vx, vy, vz) in enumerate(zip(
                V.pack16(p[0]), V.pack16(p[1]), V.pack16(p[2]))):
            xr[0, i] = vx
            yr[0, i] = vy
            zr[0, i] = vz

    def write_emit(p):
        for i, (vx, vy, vz) in enumerate(zip(
                V.pack16(p[0]), V.pack16(p[1]), V.pack16(p[2]))):
            ex_ref[0, 0, i] = vx
            ey_ref[0, 0, i] = vy
            ez_ref[0, 0, i] = vz

    @pl.when(t == 0)
    def _init():
        write_pt(ax_ref, ay_ref, az_ref, (px, py, one_l))
        cur_ref[0] = d
        hasf_ref[0] = jnp.zeros_like(d)
        fdig_ref[0] = jnp.zeros_like(d)
        write_pt(fx_ref, fy_ref, fz_ref, (one_l, one_l, zero_l))
        lab_ref[0, 0, 0] = d
        write_emit((one_l, one_l, zero_l))

    @pl.when(t > 0)
    def _step():
        cur = cur_ref[0]
        hasf = hasf_ref[0]
        acc = read_pt(ax_ref, ay_ref, az_ref)
        new_run = d != cur
        emit_real = new_run & (hasf > 0)
        lab_ref[0, 0, 0] = cur
        write_emit((V.select(emit_real, acc[0], one_l),
                    V.select(emit_real, acc[1], one_l),
                    V.select(emit_real, acc[2], zero_l)))
        cap = new_run & (hasf == 0)
        first = read_pt(fx_ref, fy_ref, fz_ref)
        write_pt(fx_ref, fy_ref, fz_ref,
                 (V.select(cap, acc[0], first[0]),
                  V.select(cap, acc[1], first[1]),
                  V.select(cap, acc[2], first[2])))
        fdig_ref[0] = jnp.where(cap, cur, fdig_ref[0])
        hasf_ref[0] = hasf | new_run.astype(hasf.dtype)
        g = V.madd(acc[0], acc[1], acc[2], px, py, consts)
        write_pt(ax_ref, ay_ref, az_ref,
                 (V.select(new_run, px, g[0]),
                  V.select(new_run, py, g[1]),
                  V.select(new_run, one_l, g[2])))
        cur_ref[0] = d


@functools.partial(jax.jit, static_argnums=(0, 4))
def _interior_v2(spec: FieldSpec, pxw, pyw, digs, interpret: bool):
    """pxw/pyw: (R, S, NW, SUB, LN) packed sorted coords;
    digs: (R, S, 1, SUB, LN). Same outputs as _interior but with the
    trailing K axis split (SUB, LN)."""
    from . import limbvec as V

    R_, S, _, SUB, LN = pxw.shape
    consts = V.spec_consts(spec)
    PW = V.PW
    blk_w = pl.BlockSpec((1, 1, V.NW, SUB, LN), lambda r, t: (r, t, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_e = pl.BlockSpec((1, 1, PW, SUB, LN), lambda r, t: (r, t, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_dig = pl.BlockSpec((1, 1, 1, SUB, LN), lambda r, t: (r, t, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    blk_fin = pl.BlockSpec((1, PW, SUB, LN), lambda r, t: (r, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    blk_vec = pl.BlockSpec((1, SUB, LN), lambda r, t: (r, 0, 0),
                           memory_space=pltpu.VMEM)
    sds = jax.ShapeDtypeStruct
    out_shape = (
        sds((R_, S, PW, SUB, LN), jnp.int32),  # emit x (16-bit packed)
        sds((R_, S, PW, SUB, LN), jnp.int32),  # emit y
        sds((R_, S, PW, SUB, LN), jnp.int32),  # emit z
        sds((R_, S, 1, SUB, LN), jnp.int32),   # labels
        sds((R_, PW, SUB, LN), jnp.int32),     # final acc x/y/z (packed)
        sds((R_, PW, SUB, LN), jnp.int32),
        sds((R_, PW, SUB, LN), jnp.int32),
        sds((R_, SUB, LN), jnp.int32),         # final cur
        sds((R_, PW, SUB, LN), jnp.int32),     # first run x/y/z (packed)
        sds((R_, PW, SUB, LN), jnp.int32),
        sds((R_, PW, SUB, LN), jnp.int32),
        sds((R_, SUB, LN), jnp.int32),         # first dig
        sds((R_, SUB, LN), jnp.int32),         # has first
    )
    return pl.pallas_call(
        functools.partial(_interior_kernel_v2, consts, S),
        out_shape=out_shape,
        grid=(R_, S),
        in_specs=[blk_w, blk_w, blk_dig],
        out_specs=(blk_e, blk_e, blk_e, blk_dig,
                   blk_fin, blk_fin, blk_fin, blk_vec,
                   blk_fin, blk_fin, blk_fin, blk_vec, blk_vec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(pxw, pyw, digs)


# ---------------------------------------------------------------------------
# kernel 1b: boundary-fragment segmented scan (replaces the XLA
# _prefix_scan_points on the 2K boundary array — 339 ms -> VMEM-resident)
# ---------------------------------------------------------------------------

def _scan_kernel(spec, m, bx_ref, by_ref, bz_ref, seg_ref,
                 p_ref, one_ref, pad_ref, c256_ref,
                 ox_ref, oy_ref, oz_ref):
    """Segmented inclusive prefix sum over the lane axis (Hillis-Steele,
    log2(m) passes of infinity-aware unsafe adds — ops/msm.
    _prefix_scan_points parity: fragments are disjoint point subsets).
    I/O is 16-bit packed (PW rows); arithmetic runs unpacked."""
    from . import limbvec as V

    p_col = p_ref[:, :]
    pad = pad_ref[:, :]
    c256 = c256_ref[:, :]
    X = (V.unpack16_stacked(bx_ref[0]), V.unpack16_stacked(by_ref[0]),
         V.unpack16_stacked(bz_ref[0]))
    seg = seg_ref[0]                          # (1, m)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    d = 1
    while d < m:
        rx = pltpu.roll(X[0], d, 1)
        ry = pltpu.roll(X[1], d, 1)
        rz = pltpu.roll(X[2], d, 1)
        rs = pltpu.roll(seg, d, 1)
        cx, cy, cz = _jadd_unsafe_body(
            spec, (rx, ry, rz), X, p_col, pad, c256)
        ok = (lane >= d) & (rs == seg)
        X = (jnp.where(ok, cx, X[0]), jnp.where(ok, cy, X[1]),
             jnp.where(ok, cz, X[2]))
        d *= 2
    ox_ref[0] = V.pack16_stacked(X[0])
    oy_ref[0] = V.pack16_stacked(X[1])
    oz_ref[0] = V.pack16_stacked(X[2])


@functools.partial(jax.jit, static_argnums=(0, 5))
def _scan_pallas(spec: FieldSpec, bx, by, bz, seg, interpret: bool):
    """bx/by/bz: (R, PW, m) packed; seg: (R, 1, m) -> merged packed."""
    from . import limbvec as V

    R_, PW_, m = bx.shape
    consts = [
        jnp.asarray(np.asarray(v).reshape(L, 1), jnp.int32)
        for v in (spec.p_limbs, spec.one_mont, spec.sub_pad, spec.c256_limbs)
    ]
    blk = pl.BlockSpec((1, PW_, m), lambda r: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    blk_seg = pl.BlockSpec((1, 1, m), lambda r: (r, 0, 0),
                           memory_space=pltpu.VMEM)
    blk_c = pl.BlockSpec((L, 1), lambda r: (0, 0), memory_space=pltpu.VMEM)
    sds = jax.ShapeDtypeStruct
    return pl.pallas_call(
        functools.partial(_scan_kernel, spec, m),
        out_shape=tuple(sds((R_, PW_, m), jnp.int32) for _ in range(3)),
        grid=(R_,),
        in_specs=[blk, blk, blk, blk_seg] + [blk_c] * 4,
        out_specs=(blk, blk, blk),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the 12 unsafe-add passes hold ~23 MB of (33, 4096) live
            # intermediates — above the 16 MB default scoped-vmem cap,
            # well inside v5e's 128 MB physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(bx, by, bz, seg, *consts)


# ---------------------------------------------------------------------------
# host finish: window Horner on host ints (the device fori_loop version
# cost ~230 ms of tiny latency-bound ops; on host it is ~1 ms and the
# result is needed as host ints for the transcript anyway)
# ---------------------------------------------------------------------------

def _hj_dbl(p: int, pt):
    """Host Jacobian doubling, a=0 curve; None = infinity."""
    if pt is None:
        return None
    x, y, z = pt
    if y == 0:
        return None
    a = x * x % p
    b = y * y % p
    c = b * b % p
    d = 2 * ((x + b) * (x + b) - a - c) % p
    e = 3 * a % p
    f = e * e % p
    x3 = (f - 2 * d) % p
    y3 = (e * (d - x3) - 8 * c) % p
    z3 = 2 * y * z % p
    return (x3, y3, z3)


def _hj_add(p: int, p1, p2):
    """Host Jacobian add (complete: handles inf, P==Q, P==-Q)."""
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    z1z1 = z1 * z1 % p
    z2z2 = z2 * z2 % p
    u1 = x1 * z2z2 % p
    u2 = x2 * z1z1 % p
    s1 = y1 * z2 * z2z2 % p
    s2 = y2 * z1 * z1z1 % p
    if u1 == u2:
        if s1 != s2:
            return None
        return _hj_dbl(p, p1)
    h = (u2 - u1) % p
    r = (s2 - s1) % p
    hh = h * h % p
    hhh = h * hh % p
    v = u1 * hh % p
    x3 = (r * r - hhh - 2 * v) % p
    y3 = (r * (v - x3) - s1 * hhh) % p
    z3 = z1 * z2 * h % p
    return (x3, y3, z3)


def _host_horner(p: int, windows, c: int):
    """windows[w] = host Jacobian int tuple (or None); returns
    sum_w windows[w] * 2^(c*w) as affine ints (or None)."""
    acc = windows[-1]
    for w in range(len(windows) - 2, -1, -1):
        for _ in range(c):
            acc = _hj_dbl(p, acc)
        acc = _hj_add(p, acc, windows[w])
    if acc is None:
        return None
    x, y, z = acc
    if z == 0:
        return None
    zi = pow(z, -1, p)
    return (x * zi * zi % p, y * zi ** 3 % p)


# ---------------------------------------------------------------------------
# kernel 2: bucket combine  sum_b b*B_b  (single launch, VMEM-resident)
# ---------------------------------------------------------------------------

def _combine_kernel(spec, m, G, bx_ref, by_ref, bz_ref,
                    p_ref, one_ref, pad_ref, c256_ref, zero_ref,
                    ox_ref, oy_ref, oz_ref):
    """Buckets for one window, laid out (m, L, G), bucket b = g*m + i.

    Emits sum_b b*B_b broadcast across the (L, G) output block (callers
    read lane 0). Infinity starts/masks are built from the RUNTIME zero
    input: literal constants fold through the adds to (1,1) values whose
    both-direction re-broadcast Mosaic cannot lower.
    """
    p_col = p_ref[:, :]
    one = one_ref[:, :]
    pad = pad_ref[:, :]
    c256 = c256_ref[:, :]
    one_b = jnp.broadcast_to(one, (L, G))
    zero_b = jnp.broadcast_to(zero_ref[:, :], (L, G))
    inf = (one_b, one_b, zero_b)

    def addu(a, b):
        return _jadd_unsafe_body(spec, a, b, p_col, pad, c256)

    def addc(a, b):
        return _jadd_complete_body(spec, a, b, p_col, pad, c256)

    # 1) within-chunk pass (serial over i, descending): running suffix
    #    run = sum_{i' >= i} B_{g,i'} (disjoint operands -> unsafe) with the
    #    weighted sum W_g = sum_{i>=1} run_i folded into the same pass
    #    (nested partials -> complete adds). fori_loop keeps the body
    #    compiled once; no per-i scratch (VMEM budget).
    from . import limbvec as V

    def rd(i):
        return (V.unpack16_stacked(bx_ref[0, i]),
                V.unpack16_stacked(by_ref[0, i]),
                V.unpack16_stacked(bz_ref[0, i]))

    run = rd(m - 1)
    W = run  # S_{m-1}; for m == 1 it is overwritten below

    def sfx_body(j, carry):
        run, W = carry
        i = m - 2 - j
        run = addu(run, rd(i))
        W = addc(W, run)
        return (run, W)

    if m > 2:
        # i from m-2 down to 1; i = 0 contributes to run only (below)
        run, W = jax.lax.fori_loop(0, m - 2, sfx_body, (run, W))
    if m > 1:
        run = addu(run, rd(0))

    # 2) cross-chunk inclusive suffix of chunk totals T_g (lane axis);
    #    disjoint ranges -> unsafe
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)
    T = run
    dshift = 1
    while dshift < G:
        rx = pltpu.roll(T[0], G - dshift, 1)
        ry = pltpu.roll(T[1], G - dshift, 1)
        rz = pltpu.roll(T[2], G - dshift, 1)
        cx, cy, cz = addu(T, (rx, ry, rz))
        ok = lane < (G - dshift)
        T = (jnp.where(ok, cx, T[0]), jnp.where(ok, cy, T[1]),
             jnp.where(ok, cz, T[2]))
        dshift *= 2
    Einc = T  # E'_g = sum_{g' >= g} T_g'

    # X = sum_{g>=1} E'_g : nested partials -> complete adds (tree over lanes)
    mask0 = lane == 0
    X = (jnp.where(mask0, one_b, Einc[0]), jnp.where(mask0, one_b, Einc[1]),
         jnp.where(mask0, zero_b, Einc[2]))  # runtime zero: see docstring
    dshift = G // 2
    while dshift >= 1:
        rx = pltpu.roll(X[0], G - dshift, 1)
        ry = pltpu.roll(X[1], G - dshift, 1)
        rz = pltpu.roll(X[2], G - dshift, 1)
        cx, cy, cz = addc(X, (rx, ry, rz))
        ok = lane < dshift
        X = (jnp.where(ok, cx, X[0]), jnp.where(ok, cy, X[1]),
             jnp.where(ok, cz, X[2]))
        dshift //= 2
    # lane 0 of X now holds sum_{g>=1} E'_g; other lanes garbage

    # 3) W computed in the stage-1 pass; m == 1 has no i >= 1 terms
    if m == 1:
        W = inf
    # Y = sum_g W_g : disjoint chunks -> unsafe tree over lanes
    Y = W
    dshift = G // 2
    while dshift >= 1:
        rx = pltpu.roll(Y[0], G - dshift, 1)
        ry = pltpu.roll(Y[1], G - dshift, 1)
        rz = pltpu.roll(Y[2], G - dshift, 1)
        cx, cy, cz = addu(Y, (rx, ry, rz))
        ok = lane < dshift
        Y = (jnp.where(ok, cx, Y[0]), jnp.where(ok, cy, Y[1]),
             jnp.where(ok, cz, Y[2]))
        dshift //= 2

    # 4) total = m * X + Y  (m = 2^log2m doublings), complete combine
    assert m & (m - 1) == 0
    mX = X
    steps = m.bit_length() - 1
    for _ in range(steps):
        mX = _jdouble_body(spec, mX, p_col, pad, c256)
    tx, ty, tz = addc(mX, Y)
    ox_ref[0] = tx
    oy_ref[0] = ty
    oz_ref[0] = tz


@functools.partial(jax.jit, static_argnums=(0, 4))
def _combine(spec: FieldSpec, bx, by, bz, interpret: bool):
    """bx/by/bz: (R, m, PW, G) PACKED bucket coords -> (R, L, G) window
    sums (result in lane 0; output stays unpacked — it is tiny)."""
    R_, m, PW_, G = bx.shape
    consts = [
        jnp.asarray(np.asarray(v).reshape(L, 1), jnp.int32)
        for v in (spec.p_limbs, spec.one_mont, spec.sub_pad, spec.c256_limbs)
    ] + [jnp.zeros((L, 1), jnp.int32)]
    blk_b = pl.BlockSpec((1, m, PW_, G), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_c = pl.BlockSpec((L, 1), lambda r: (0, 0), memory_space=pltpu.VMEM)
    blk_o = pl.BlockSpec((1, L, G), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM)
    sds = jax.ShapeDtypeStruct

    def kern(bx_ref, by_ref, bz_ref, *rest):
        _combine_kernel(spec, m, G, bx_ref, by_ref, bz_ref, *rest)

    return pl.pallas_call(
        kern,
        out_shape=tuple(sds((R_, L, G), jnp.int32) for _ in range(3)),
        grid=(R_,),
        in_specs=[blk_b] * 3 + [blk_c] * 5,
        out_specs=(blk_o, blk_o, blk_o),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(bx, by, bz, *consts)


# ---------------------------------------------------------------------------
# driver: full batched MSM
# ---------------------------------------------------------------------------

def msm_supported(n: int, k_lanes: int = DEFAULT_K_LANES) -> bool:
    return n >= 2 * k_lanes and n % k_lanes == 0


def msm_pallas_batch(curve: CurveSpec, points: JPoint,
                     scalars_mont: jnp.ndarray, c: int = 13,
                     k_lanes: int = DEFAULT_K_LANES,
                     interpret: bool = False) -> JPoint:
    """B MSMs over one affine base set: scalars (Bm, L, n) -> JPoint (L, Bm).

    points must be affine (z==1 Montgomery; SRS bases are). Bit-exact with
    ops/msm.msm_batch. MSMs go through the kernels ONE AT A TIME in a host
    loop: the per-MSM working set (gathered coords + emit stream) is
    ~6 x W x n field elements (~2.5 GB at k=17), so batching rows would
    blow HBM; the loop also keeps a single compiled variant for every
    batch size (B enters no static shape).
    """
    Bm = scalars_mont.shape[0]
    # unstack/pack through AOT-cached graphs: on the tunneled backend every
    # ad-hoc eager op (slice/concat) is its own remote compile per process
    rows = _unstack_aot(Bm)(scalars_mont) if Bm > 1 else \
        _unstack_aot(1)(scalars_mont)
    outs = [
        _msm_single_aot(curve, points, rows[i], c, k_lanes, interpret)
        for i in range(Bm)
    ]
    if Bm == 1:
        return outs[0]
    xs, ys, zs = [o.x for o in outs], [o.y for o in outs], [o.z for o in outs]
    px, py, pz = _pack_aot(Bm)(xs, ys, zs)
    return JPoint(px, py, pz)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _msm_pallas_single(curve: CurveSpec, points: JPoint,
                       scalars_mont: jnp.ndarray, c: int,
                       k_lanes: int, interpret: bool) -> JPoint:
    """One MSM: scalars (L, n) -> JPoint (L, 1)."""
    f_r = _fr_spec()
    f_q = curve.field
    n = scalars_mont.shape[1]
    Bm = 1
    K = k_lanes
    S = n // K
    nb = 1 << c
    G = min(COMBINE_G, nb)
    m = nb // G

    std = M.normalize(f_r, M.from_mont(f_r, scalars_mont))
    from .msm import scalar_digits

    digits = scalar_digits(std, c)  # (W, n)
    W = digits.shape[0]
    R_ = W

    # two-operand sort: no (digit << bits) | index key packing, which
    # overflows int32 once c + ceil(log2 n) > 31 (k >= 19 at c=13)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], digits.shape)
    sdig, order = jax.lax.sort((digits, idx), dimension=1, num_keys=1)

    # gather sorted affine coords -> (R, S, L, K) step-major
    def gat(coord):  # coord (L, n)
        g = coord[:, order]                        # (L, R, n)
        g = jnp.moveaxis(g, 1, 0)                  # (R, L, n)
        return jnp.transpose(g.reshape(R_, L, K, S), (0, 3, 1, 2))

    px = gat(points.x)
    py = gat(points.y)
    digs = jnp.transpose(sdig.reshape(R_, 1, K, S), (0, 3, 1, 2))

    (ex, ey, ez, labs, acx, acy, acz, cur, fx, fy, fz, fdig, hasf) = \
        _interior(f_q, px, py, digs, interpret)

    # lane-major flatten: element (k, t) -> k*S + t
    def lm(e):  # (R, S, L, K) -> (R, L, n)
        return jnp.transpose(e, (0, 2, 3, 1)).reshape(R_, L, n)

    ex, ey, ez = lm(ex), lm(ey), lm(ez)
    labs = jnp.transpose(labs, (0, 2, 3, 1)).reshape(R_, n)

    # bucket fill: last emit position per digit via searchsorted
    targets = jnp.arange(nb, dtype=jnp.int32)
    pos = jax.vmap(
        lambda lr: jnp.searchsorted(lr, targets, side="right").astype(jnp.int32)
    )(labs) - 1
    pos = jnp.maximum(pos, 0)
    hit = jnp.take_along_axis(labs, pos, axis=1) == targets[None]

    def fill(e):  # (R, L, n) -> (R, L, nb)
        g = jnp.take_along_axis(
            e, jnp.broadcast_to(pos[:, None, :], (R_, L, nb)), axis=2
        )
        return g

    one_col = jnp.asarray(
        np.asarray(f_q.one_mont).reshape(1, L, 1), jnp.int32
    )
    bx = jnp.where(hit[:, None, :], fill(ex), one_col)
    by = jnp.where(hit[:, None, :], fill(ey), one_col)
    bz = jnp.where(hit[:, None, :], fill(ez), 0)

    # boundary merge (XLA; small): lane-first runs + lane-tail accumulators
    hasf_b = hasf[:, 0, :] > 0                    # (R, K)
    a_dig = jnp.where(hasf_b, fdig[:, 0, :], cur[:, 0, :])
    inf_xy = jnp.broadcast_to(one_col, (R_, L, K))
    a_x = jnp.where(hasf_b[:, None, :], fx, inf_xy)
    a_y = jnp.where(hasf_b[:, None, :], fy, inf_xy)
    a_z = jnp.where(hasf_b[:, None, :], fz, 0)
    seg = jnp.stack([a_dig, cur[:, 0, :]], axis=2).reshape(R_, 2 * K)
    bnd = JPoint(
        jnp.stack([a_x, acx], axis=3).reshape(R_, L, 2 * K),
        jnp.stack([a_y, acy], axis=3).reshape(R_, L, 2 * K),
        jnp.stack([a_z, acz], axis=3).reshape(R_, L, 2 * K),
    )
    from .msm import _prefix_scan_points

    merged = jax.vmap(
        lambda p_x, p_y, p_z, s: _prefix_scan_points(
            curve, JPoint(p_x, p_y, p_z), s
        )
    )(bnd.x, bnd.y, bnd.z, seg)
    is_tail = jnp.concatenate(
        [seg[:, :-1] != seg[:, 1:], jnp.ones((R_, 1), bool)], axis=1
    )
    target = jnp.where(is_tail, seg, nb)  # nb = dump (dropped by scatter)

    def scat(b, vals):  # b (R, L, nb); vals (R, L, 2K)
        return jax.vmap(
            lambda bb, tt, vv: bb.at[:, tt].set(vv, mode="drop")
        )(b, target, vals)

    bx = scat(bx, merged.x)
    by = scat(by, merged.y)
    bz = scat(bz, merged.z)

    # combine: pack 16-bit (the kernel's input format), then
    # (R, PW, nb) -> (R, m, PW, G), bucket b = g*m + i
    from . import limbvec as V

    def to_mg(b):
        b = jnp.concatenate(
            [b[:, 0:L - 1:2] + (b[:, 1:L - 1:2] << 16), b[:, L - 1:]],
            axis=1)
        return jnp.transpose(b.reshape(R_, V.PW, G, m), (0, 3, 1, 2))

    wx, wy, wz = _combine(f_q, to_mg(bx), to_mg(by), to_mg(bz), interpret)
    wsum = JPoint(wx[..., :1], wy[..., :1], wz[..., :1])  # (R, L, 1)

    # Horner over windows
    ws = JPoint(
        wsum.x.reshape(Bm, W, L), wsum.y.reshape(Bm, W, L),
        wsum.z.reshape(Bm, W, L),
    )

    def horner(i, acc):
        w = W - 2 - i
        s = JPoint(
            jnp.moveaxis(jax.lax.dynamic_index_in_dim(ws.x, w, 1, False), 0, 1),
            jnp.moveaxis(jax.lax.dynamic_index_in_dim(ws.y, w, 1, False), 0, 1),
            jnp.moveaxis(jax.lax.dynamic_index_in_dim(ws.z, w, 1, False), 0, 1),
        )
        for _ in range(c):
            acc = E.double(curve, acc)
        return E.add_unsafe(curve, acc, s)

    top = JPoint(ws.x[:, W - 1].T, ws.y[:, W - 1].T, ws.z[:, W - 1].T)
    return jax.lax.fori_loop(0, W - 1, horner, top)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _msm_windows_v3(curve: CurveSpec, points: JPoint,
                    scalars_mont: jnp.ndarray, c: int,
                    k_lanes: int, interpret: bool):
    """v3 device pipeline: v2 front (packed sort key + packed word
    gather + list-form interior) + Pallas boundary scan; returns the W
    per-window sums as (W, L) coord tensors — the Horner tail and affine
    conversion run on host (_host_horner)."""
    from . import limbvec as V

    f_r = _fr_spec()
    f_q = curve.field
    n = scalars_mont.shape[1]
    K = k_lanes
    S = n // K
    nb = 1 << c
    G = min(COMBINE_G, nb)
    m = nb // G
    SUB = V2_SUB
    LN = K // SUB

    std = M.normalize(f_r, M.from_mont(f_r, scalars_mont))
    from .msm import scalar_digits

    digits = scalar_digits(std, c)
    W = digits.shape[0]
    R_ = W
    logn = n.bit_length() - 1

    if c + logn <= 31:
        key = (digits << logn) | jnp.arange(n, dtype=jnp.int32)[None]
        skey = jax.lax.sort(key, dimension=1)
        sdig = skey >> logn
        order = skey & (n - 1)
    else:
        idx = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[None], digits.shape)
        sdig, order = jax.lax.sort((digits, idx), dimension=1, num_keys=1)

    pxw_full = jnp.stack(V.pack_words([points.x[i] for i in range(L)]))
    pyw_full = jnp.stack(V.pack_words([points.y[i] for i in range(L)]))

    def gatw(wds):
        g = wds[:, order]
        g = jnp.moveaxis(g, 1, 0)
        g = jnp.transpose(g.reshape(R_, V.NW, K, S), (0, 3, 1, 2))
        return g.reshape(R_, S, V.NW, SUB, LN)

    pxw = gatw(pxw_full)
    pyw = gatw(pyw_full)
    digs = jnp.transpose(sdig.reshape(R_, 1, K, S), (0, 3, 1, 2))
    digs = digs.reshape(R_, S, 1, SUB, LN)

    outs = _interior_v2(f_q, pxw, pyw, digs, interpret)
    (ex, ey, ez, labs, acx, acy, acz, cur, fx, fy, fz, fdig, hasf) = (
        o.reshape(o.shape[:-2] + (o.shape[-2] * o.shape[-1],))
        for o in outs
    )
    labs = labs[:, :, None] if labs.ndim == 2 else labs
    cur = cur[:, None] if cur.ndim == 2 else cur
    fdig = fdig[:, None] if fdig.ndim == 2 else fdig
    hasf = hasf[:, None] if hasf.ndim == 2 else hasf

    PW = V.PW

    def lm(e):  # (R, S, PW, K) -> (R, PW, n): 16-bit-packed coords
        return jnp.transpose(e, (0, 2, 3, 1)).reshape(R_, PW, n)

    ex, ey, ez = lm(ex), lm(ey), lm(ez)
    labs = jnp.transpose(labs, (0, 2, 3, 1)).reshape(R_, n)

    targets = jnp.arange(nb, dtype=jnp.int32)
    pos = jax.vmap(
        lambda lr: jnp.searchsorted(lr, targets, side="right").astype(jnp.int32)
    )(labs) - 1
    pos = jnp.maximum(pos, 0)
    hit = jnp.take_along_axis(labs, pos, axis=1) == targets[None]

    def fill(e):  # (R, PW, n) -> (R, PW, nb): half the round-3 bytes
        return jnp.take_along_axis(
            e, jnp.broadcast_to(pos[:, None, :], (R_, PW, nb)), axis=2
        )

    one_host = np.asarray(f_q.one_mont).astype(np.int64)
    one_pk = np.concatenate(
        [one_host[0:L - 1:2] + (one_host[1:L - 1:2] << 16),
         one_host[L - 1:]]).astype(np.int32)
    one_col = jnp.asarray(one_pk.reshape(1, PW, 1))
    bx = jnp.where(hit[:, None, :], fill(ex), one_col)
    by = jnp.where(hit[:, None, :], fill(ey), one_col)
    bz = jnp.where(hit[:, None, :], fill(ez), 0)

    # boundary fragments -> Pallas segmented scan (not XLA log passes)
    hasf_b = hasf[:, 0, :] > 0
    a_dig = jnp.where(hasf_b, fdig[:, 0, :], cur[:, 0, :])
    inf_xy = jnp.broadcast_to(one_col, (R_, PW, K))
    a_x = jnp.where(hasf_b[:, None, :], fx, inf_xy)
    a_y = jnp.where(hasf_b[:, None, :], fy, inf_xy)
    a_z = jnp.where(hasf_b[:, None, :], fz, 0)
    seg = jnp.stack([a_dig, cur[:, 0, :]], axis=2).reshape(R_, 1, 2 * K)
    bnd_x = jnp.stack([a_x, acx], axis=3).reshape(R_, PW, 2 * K)
    bnd_y = jnp.stack([a_y, acy], axis=3).reshape(R_, PW, 2 * K)
    bnd_z = jnp.stack([a_z, acz], axis=3).reshape(R_, PW, 2 * K)
    mx, my, mz = _scan_pallas(f_q, bnd_x, bnd_y, bnd_z, seg, interpret)
    seg2 = seg[:, 0, :]
    is_tail = jnp.concatenate(
        [seg2[:, :-1] != seg2[:, 1:], jnp.ones((R_, 1), bool)], axis=1
    )
    target = jnp.where(is_tail, seg2, nb)

    def scat(b, vals):
        return jax.vmap(
            lambda bb, tt, vv: bb.at[:, tt].set(vv, mode="drop")
        )(b, target, vals)

    bx = scat(bx, mx)
    by = scat(by, my)
    bz = scat(bz, mz)

    def to_mg(b):  # (R, PW, nb) -> (R, m, PW, G), bucket b = g*m + i
        return jnp.transpose(b.reshape(R_, PW, G, m), (0, 3, 1, 2))

    wx, wy, wz = _combine(f_q, to_mg(bx), to_mg(by), to_mg(bz), interpret)
    # (R, L, G) -> lane 0 holds the window sum -> (W, L)
    return wx[..., 0], wy[..., 0], wz[..., 0]


def msm_hostout(curve: CurveSpec, points: JPoint, scalars_mont: jnp.ndarray,
                c: int = 13, k_lanes: int = DEFAULT_K_LANES,
                interpret: bool = False) -> list:
    """B MSMs -> host affine int tuples (None = infinity).

    The device graph ends at the W window sums (tiny pull); Horner and
    the affine conversion run on host ints — this is both faster (the
    device fori_loop tail was ~230 ms of latency-bound (L,1) ops) and
    lands where the prover needs commitments anyway (the transcript)."""
    f_q = curve.field
    Bm = scalars_mont.shape[0]
    rows = _unstack_aot(Bm)(scalars_mont) if Bm > 1 else \
        _unstack_aot(1)(scalars_mont)
    out = []
    for i in range(Bm):
        wx, wy, wz = _windows_v3_aot(curve, points, rows[i], c, k_lanes,
                                     interpret)
        xs = f_q.decode(np.asarray(wx).T)
        ys = f_q.decode(np.asarray(wy).T)
        zs = f_q.decode(np.asarray(wz).T)
        wins = [None if z == 0 else (x, y, z)
                for x, y, z in zip(xs, ys, zs)]
        out.append(_host_horner(f_q.p, wins, c))
    return out


@functools.lru_cache(maxsize=1)
def _fr_spec():
    from ..fields.limbs import FR_SPEC

    return FR_SPEC


from ..utils.aot_cache import aot_wrap  # noqa: E402

# ~8 min remote compile per process without the AOT disk cache
_msm_single_aot = aot_wrap("msm_single", _msm_pallas_single,
                           static_argnums=(0, 3, 4, 5))
_windows_v3_aot = aot_wrap("msm4a_windows", _msm_windows_v3,
                           static_argnums=(0, 3, 4, 5))


@functools.lru_cache(maxsize=None)
def _unstack_aot(B: int):
    return aot_wrap(f"unstack{B}", jax.jit(
        lambda s: tuple(s[i] for i in range(B))))


@functools.lru_cache(maxsize=None)
def _pack_aot(B: int):
    return aot_wrap(f"packpts{B}", jax.jit(
        lambda xs, ys, zs: (jnp.concatenate(xs, axis=1),
                            jnp.concatenate(ys, axis=1),
                            jnp.concatenate(zs, axis=1))))
