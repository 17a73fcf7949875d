"""Pippenger multi-scalar multiplication over bn254 G1 (KZG commit engine).

Replaces the rayon-parallel MSM inside `halo2_proofs::create_proof`
(SURVEY §2.2/§3.2) with a TPU-vectorized pipeline built for XLA's
compilation model (small loop bodies, no giant unrolled graphs):

  1. scalars -> canonical limbs -> c-bit window digits          (VPU)
  2. per window: sort (digit, index) keys, gather points        (XLA sort)
  3. K-lane serial run accumulation: the sorted stream is split into K
     contiguous chunks; a fori_loop walks the S = n/K steps, each lane
     adding its current point into a running per-run accumulator and
     scattering completed runs into the bucket array (scatter indices are
     provably collision-free across lanes; see lane-range argument below)
  4. runs spanning lane boundaries are merged with a log-pass segmented
     Hillis-Steele scan over the 2K boundary slots
  5. suffix-sum over buckets (log passes) turns them into sum_b b*B_b
  6. Horner window combine (c doublings per window)

Total point-add work is ~n + 2^(c+1) + 4K per window — the textbook
Pippenger cost — with every loop body compiled exactly once.

PRECONDITION: input points must be pairwise-distinct (KZG SRS bases are).
Stages 3-4 use `add_unsafe` (no P==+-Q handling): operands are sums of
disjoint subsets of distinct fixed SRS points, so a degenerate collision
implies a nontrivial linear relation among SRS points — cryptographically
negligible, and a wrong result can only yield a proof that fails
verification. Stage 5 uses complete adds (suffix partials repeat by
construction across empty buckets).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields.limbs import L
from . import ec as E
from . import modops as M
from .ec import CurveSpec, JPoint

DEFAULT_C = 13


def scalar_digits(scalars_std: jnp.ndarray, c: int) -> jnp.ndarray:
    """(L, n) tight standard-form limbs -> (W, n) int32 window digits.

    Digits decompose the *integer value* (any representative works: the
    group has prime exponent, so sum(s_i P_i) only depends on s_i mod r).
    """
    nbits = 8 * L
    W = -(-nbits // c)
    digits = []
    for w in range(W):
        bit0 = w * c
        limb0 = bit0 // 8
        shift = bit0 % 8
        packed = scalars_std[limb0].astype(jnp.int32)
        if limb0 + 1 < L:
            packed = packed + (scalars_std[limb0 + 1] << 8)
        if limb0 + 2 < L:
            packed = packed + (scalars_std[limb0 + 2] << 16)
        # tight limbs (<=255) keep packed < 2^24; a c<=13 window starting
        # anywhere within the first byte is fully contained in 3 limbs.
        digits.append((packed >> shift) & ((1 << c) - 1))
    return jnp.stack(digits)  # (W, n)


def _pt_cols(p: JPoint, idx) -> JPoint:
    return JPoint(p.x[..., idx], p.y[..., idx], p.z[..., idx])


def _prefix_scan_points(curve: CurveSpec, pts: JPoint, seg: jnp.ndarray,
                        complete: bool = False) -> JPoint:
    """Segmented inclusive prefix sum via Hillis-Steele log passes.

    pts: (L, m); seg: (m,) segment ids on contiguous runs. The last element
    of each segment ends up holding the segment total. Graph: one add per
    pass, m log m work (used only on small boundary/bucket arrays).

    complete=True uses the fully-complete add: required whenever partial
    sums can collide in value (e.g. summing suffix arrays with repeats).
    """
    m = seg.shape[0]
    npasses = max(m - 1, 1).bit_length()
    pos = jnp.arange(m)

    def body(p, state):
        x, y, z, s = state
        d = 1 << p
        rx = jnp.roll(x, d, axis=1)
        ry = jnp.roll(y, d, axis=1)
        rz = jnp.roll(z, d, axis=1)
        rs = jnp.roll(s, d)
        cand = (E.add_unsafe_fast if not complete else E.add)(curve, JPoint(rx, ry, rz), JPoint(x, y, z))
        ok = (s == rs) & (pos >= d)
        x = M.select(ok, cand.x, x)
        y = M.select(ok, cand.y, y)
        z = M.select(ok, cand.z, z)
        return (x, y, z, s)

    x, y, z, _ = jax.lax.fori_loop(0, npasses, body, (pts.x, pts.y, pts.z, seg))
    return JPoint(x, y, z)


def _suffix_sum_points(curve: CurveSpec, pts: JPoint) -> JPoint:
    """Unsegmented suffix sums: out[i] = sum_{j >= i} pts[j] (log passes)."""
    m = pts.x.shape[1]
    npasses = max(m - 1, 1).bit_length()
    pos = jnp.arange(m)

    def body(p, state):
        x, y, z = state
        d = 1 << p
        rx = jnp.roll(x, -d, axis=1)
        ry = jnp.roll(y, -d, axis=1)
        rz = jnp.roll(z, -d, axis=1)
        # suffix partials repeat across empty buckets -> complete add needed
        cand = E.add(curve, JPoint(x, y, z), JPoint(rx, ry, rz))
        ok = pos < m - d
        x = M.select(ok, cand.x, x)
        y = M.select(ok, cand.y, y)
        z = M.select(ok, cand.z, z)
        return (x, y, z)

    x, y, z = jax.lax.fori_loop(0, npasses, body, (pts.x, pts.y, pts.z))
    return JPoint(x, y, z)


def _scatter_set(buckets: JPoint, target: jnp.ndarray, vals: JPoint) -> JPoint:
    return JPoint(
        buckets.x.at[:, target].set(vals.x),
        buckets.y.at[:, target].set(vals.y),
        buckets.z.at[:, target].set(vals.z),
    )


def _window_bucket_sum(curve: CurveSpec, spts: JPoint, sdig: jnp.ndarray,
                       c: int, lanes: int) -> JPoint:
    """sum_b b * (sum of points with digit b) for one window.

    spts/sdig are already sorted by digit. lanes (K) is static; n % K == 0.
    """
    n = sdig.shape[0]
    K = lanes
    S = n // K
    nb = 1 << c
    sdig2 = sdig.reshape(K, S)
    px = spts.x.reshape(L, K, S)
    py = spts.y.reshape(L, K, S)
    pz = spts.z.reshape(L, K, S)

    buckets0 = E.infinity((nb + 1,), curve)  # slot nb = dump
    acc0 = E.infinity((K,), curve)
    state0 = dict(
        acc=acc0,
        cur=jnp.zeros(K, jnp.int32) - 1,
        first_sum=E.infinity((K,), curve),
        first_dig=jnp.zeros(K, jnp.int32),
        has_first=jnp.zeros(K, bool),
        buckets=buckets0,
    )

    def body(t, st):
        d = jax.lax.dynamic_index_in_dim(sdig2, t, 1, keepdims=False)
        pt = JPoint(
            jax.lax.dynamic_index_in_dim(px, t, 2, keepdims=False),
            jax.lax.dynamic_index_in_dim(py, t, 2, keepdims=False),
            jax.lax.dynamic_index_in_dim(pz, t, 2, keepdims=False),
        )
        is_first_step = t == 0
        new_run = (d != st["cur"]) & ~is_first_step
        emit_first = new_run & ~st["has_first"]
        emit_scatter = new_run & st["has_first"]
        first_sum = E.point_select(emit_first, st["acc"], st["first_sum"])
        first_dig = jnp.where(emit_first, st["cur"], st["first_dig"])
        has_first = st["has_first"] | new_run
        # interior runs: distinct lanes always carry distinct digits here
        target = jnp.where(emit_scatter, st["cur"], nb)
        buckets = _scatter_set(st["buckets"], target, st["acc"])
        grown = E.add_unsafe_fast(curve, st["acc"], pt)
        reset = new_run | is_first_step
        acc = E.point_select(reset, pt, grown)
        return dict(
            acc=acc, cur=d, first_sum=first_sum, first_dig=first_dig,
            has_first=has_first, buckets=buckets,
        )

    st = jax.lax.fori_loop(0, S, body, state0)

    # boundary slots: [A_0, B_0, A_1, B_1, ...]; A_l = lane's first run
    # (valid iff has_first, else an infinity merged into B's segment),
    # B_l = lane's final accumulator.
    a_dig = jnp.where(st["has_first"], st["first_dig"], st["cur"])
    a_pts = E.point_select(st["has_first"], st["first_sum"],
                           E.infinity((K,), curve))
    seg = jnp.stack([a_dig, st["cur"]], axis=1).reshape(2 * K)
    bx = jnp.stack([a_pts.x, st["acc"].x], axis=2).reshape(L, 2 * K)
    by = jnp.stack([a_pts.y, st["acc"].y], axis=2).reshape(L, 2 * K)
    bz = jnp.stack([a_pts.z, st["acc"].z], axis=2).reshape(L, 2 * K)
    merged = _prefix_scan_points(curve, JPoint(bx, by, bz), seg)
    is_tail = jnp.concatenate([seg[:-1] != seg[1:], jnp.array([True])])
    target = jnp.where(is_tail, seg, nb)
    buckets = _scatter_set(st["buckets"], target, merged)

    # drop dump slot + zero bucket 0, then suffix sums
    buckets = _pt_cols(buckets, jnp.arange(nb))
    inf1 = E.infinity((1,), curve)
    buckets = JPoint(
        buckets.x.at[:, 0:1].set(inf1.x),
        buckets.y.at[:, 0:1].set(inf1.y),
        buckets.z.at[:, 0:1].set(inf1.z),
    )
    sfx = _suffix_sum_points(curve, buckets)
    # sum_{b>=1} sfx_b = sum_b b*B_b: prefix-sum sfx[1:] and take the last
    tail = _pt_cols(sfx, jnp.arange(1, nb))
    summed = _prefix_scan_points(
        curve, tail, jnp.zeros(nb - 1, jnp.int32), complete=True
    )
    return _pt_cols(summed, jnp.arange(nb - 2, nb - 1))


def _use_fused(n: int) -> bool:
    """Route to the fused-Pallas engine (ops/msm_pallas.py) on TPU."""
    import os

    mode = os.environ.get("WH2_MSM_IMPL", "auto")
    if mode == "xla":
        return False
    from .msm_pallas import DEFAULT_K_LANES, msm_supported

    if not msm_supported(n, DEFAULT_K_LANES):
        return False
    return mode == "pallas" or jax.default_backend() == "tpu"


def msm(curve: CurveSpec, points: JPoint, scalars_mont: jnp.ndarray,
        c: int | None = None, lanes: int | None = None) -> JPoint:
    """MSM: sum_i scalars[i] * points[i] -> one Jacobian point (L, 1).

    points: (L, n) Jacobian (affine z=1 from the SRS); scalars_mont: (L, n)
    Montgomery-form Fr limbs (the prover's native representation).
    """
    n = scalars_mont.shape[1]
    if _use_fused(n):
        from .msm_pallas import DEFAULT_K_LANES, _msm_single_aot

        # `lanes` is a serial-Pippenger knob; the fused engine has its own
        # static K and ignores it. Direct single call: no [None] reshape
        # (every ad-hoc eager op is a remote compile on the tunneled
        # backend).
        return _msm_single_aot(curve, points, scalars_mont,
                               c if c is not None else _default_c(n),
                               DEFAULT_K_LANES, False)
    return _msm_jit(curve, points, scalars_mont, c, lanes)


def _default_c(n: int) -> int:
    """Window size balancing W*(n + 2^(c+1)) total work."""
    return min(DEFAULT_C, max(4, n.bit_length() - 5))


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _msm_jit(curve, points, scalars_mont, c, lanes):
    return _msm_impl(curve, points, scalars_mont, c, lanes)


def msm_batch(curve: CurveSpec, points: JPoint, scalars_batch: jnp.ndarray,
              c: int | None = None, lanes: int | None = None) -> JPoint:
    """B MSMs sharing one base set in ONE dispatch: scalars (B, L, n) ->
    JPoint of (L, B). The fused-Pallas engine folds the batch into extra
    kernel grid rows (TPU); the XLA fallback vmaps the serial Pippenger
    steps (this is how the prover commits all advice columns at once)."""
    n = scalars_batch.shape[2]
    if _use_fused(n):
        from .msm_pallas import msm_pallas_batch

        return msm_pallas_batch(curve, points, scalars_batch,
                                c if c is not None else _default_c(n))
    return _msm_batch_jit(curve, points, scalars_batch, c, lanes)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _msm_batch_jit(curve, points, scalars_batch, c, lanes):
    res = jax.vmap(
        lambda sc: _msm_impl(curve, points, sc, c, lanes)
    )(scalars_batch)
    return JPoint(
        jnp.moveaxis(res.x[..., 0], 0, 1),
        jnp.moveaxis(res.y[..., 0], 0, 1),
        jnp.moveaxis(res.z[..., 0], 0, 1),
    )


def _msm_impl(curve: CurveSpec, points: JPoint, scalars_mont: jnp.ndarray,
              c: int | None = None, lanes: int | None = None) -> JPoint:
    f_r = _fr_spec()
    n = scalars_mont.shape[1]
    if c is None:
        c = _default_c(n)
    if lanes is None:
        # balance interior serial steps (n/lanes) against the boundary-scan
        # work (~2*lanes*log): n/64 capped to [64, 4096]
        lanes = max(64, min(4096, n // 64))
        while n % lanes or lanes > n:
            lanes //= 2
    std = M.normalize(f_r, M.from_mont(f_r, scalars_mont))
    digits = scalar_digits(std, c)  # (W, n)
    W = digits.shape[0]

    def per_window(_, dig):
        # two-operand sort (no (digit << bits) | index packing: that
        # overflows int32 once c + ceil(log2 n) > 31, i.e. k >= 19 at c=13)
        sdig, order = jax.lax.sort(
            (dig, jnp.arange(n, dtype=jnp.int32)), num_keys=1
        )
        spts = _pt_cols(points, order)
        return None, _window_bucket_sum(curve, spts, sdig, c, lanes)

    _, wsums = jax.lax.scan(per_window, None, digits)

    def horner(i, acc):
        w = W - 2 - i
        s = JPoint(
            jax.lax.dynamic_index_in_dim(wsums.x, w, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(wsums.y, w, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(wsums.z, w, 0, keepdims=False),
        )
        for _ in range(c):
            acc = E.double(curve, acc)
        return E.add_unsafe(curve, acc, s)

    top = JPoint(wsums.x[W - 1], wsums.y[W - 1], wsums.z[W - 1])
    return jax.lax.fori_loop(0, W - 1, horner, top)


@functools.lru_cache(maxsize=1)
def _fr_spec():
    from ..fields.limbs import FR_SPEC

    return FR_SPEC


def msm_host(curve: CurveSpec, point_ints: list, scalar_ints: list,
             c: int | None = None):
    """Convenience host wrapper: int points/scalars -> affine int result."""
    pts = E.from_affine_ints(curve, point_ints)
    f_r = _fr_spec()
    sc = jnp.asarray(f_r.encode(scalar_ints))
    res = msm(curve, pts, sc, c)
    return E.to_affine_ints(curve, res)[0]
