"""The PLONKish prover: create_proof (KZG + SHPLONK + Blake2b transcript).

TPU-native replacement for `halo2_proofs::plonk::create_proof`
(reference hot path, SURVEY §3.2). Protocol phases follow the PSE halo2
structure: advice commits -> theta -> lookup permuted commits ->
beta/gamma -> permutation & lookup grand products -> vanishing random poly
-> y -> quotient pieces -> x -> evaluations -> SHPLONK multiopen (v/y
challenges, H commitment, u challenge, final witness W).

Execution model (round 3): every segment between transcript interactions
is ONE fused, AOT-cached device graph (plonk/fused.py) — the tunneled
TPU backend pays ~4 ms per dispatch and ~40 s per remote compile, so the
graph count IS the latency model. Host-side work is only the transcript,
the lookup permutation sort, witness limb packing, and tiny
interpolations.
"""
from __future__ import annotations

import os
import sys
import time as _time

import jax.numpy as jnp
import numpy as np

from ..fields.constants import BN254_FR, BN254_FR_DELTA
from ..fields.limbs import FR_SPEC, ints_to_limbs_fast, limbs_to_ints_fast
from ..ops import modops as M
from . import cs as CS
from .domain import Domain
from .fused import (FusedPhases, batched_c2e, batched_l2c, to_mont_split,
                    to_mont_stack)
from .keygen import commit_coeff, commit_coeff_batch, commit_lagrange_batch
from .transcript import Blake2bWrite

R = BN254_FR
SPEC = FR_SPEC

# conformance/debug capture of the last proof's internals (tests only)
LAST_DEBUG: dict = {}


LAST_SPANS: dict[str, float] = {}  # phase -> seconds, last proof (trace mode)


class _Span:
    """Phase span timer (ark-std start_timer!/end_timer! parity, SURVEY §5.1).

    Enabled with WH2_TRACE=1; blocks on device completion at span ends so
    the numbers attribute real device time to each phase. Spans are also
    recorded in LAST_SPANS for the roofline report (utils/roofline.py)."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = _time.time()
        return self

    def __exit__(self, *a):
        if os.environ.get("WH2_TRACE"):
            # anchor with a REAL device->host pull: on the tunneled axon
            # backend block_until_ready does NOT wait for
            # deserialized-executable outputs (results/ROUND3.md), so a
            # tiny D2H enqueued after everything on the single device
            # stream is the only trustworthy fence
            np.asarray(jnp.zeros((8, 128)))
            dt = _time.time() - self.t0
            LAST_SPANS[self.name] = dt
            print(f"[span] {self.name}: {dt:.3f}s",
                  file=sys.stderr, flush=True)


def _rand_field(rng) -> int:
    return int.from_bytes(rng(32), "little") % R


def decode_column(col_mont: jnp.ndarray) -> list[int]:
    """Device Montgomery tensor -> host canonical ints."""
    std = M.normalize(SPEC, M.from_mont(SPEC, col_mont))
    return limbs_to_ints_fast(np.asarray(std))


def _mont_const(v: int) -> jnp.ndarray:
    return jnp.asarray(SPEC.encode([v]), dtype=jnp.int32)  # (L, 1)


_FUSED_CACHE: dict = {}


def _fused_for(pk) -> FusedPhases:
    key = id(pk)
    if key not in _FUSED_CACHE:
        _FUSED_CACHE[key] = FusedPhases(pk)
        # stacked pk tensors (built once per process per pk)
        pk._fixed_lag_stack = (jnp.stack(pk.fixed_lagrange)
                               if pk.fixed_lagrange else
                               jnp.zeros((0, 33, 1 << pk.vk.domain.k),
                                         dtype=jnp.int32))
        pk._sigma_lag_stack = (jnp.stack(pk.sigma_lagrange)
                               if pk.sigma_lagrange else
                               jnp.zeros((0, 33, 1 << pk.vk.domain.k),
                                         dtype=jnp.int32))
        pk._fixed_coeff_stack = (jnp.stack(pk.fixed_coeff)
                                 if pk.fixed_coeff else
                                 jnp.zeros((0, 33, 1 << pk.vk.domain.k),
                                           dtype=jnp.int32))
        pk._sigma_coeff_stack = (jnp.stack(pk.sigma_coeff)
                                 if pk.sigma_coeff else
                                 jnp.zeros((0, 33, 1 << pk.vk.domain.k),
                                           dtype=jnp.int32))
        std = jnp.asarray(ints_to_limbs_fast(
            [int(v) for v in pk.omega_pows_np]))
        pk._omega_mont = M.to_mont(SPEC, std)
    return _FUSED_CACHE[key]


def _pack_std(cols: list[list[int]], n: int) -> np.ndarray:
    """Host int columns -> (B, L, n) standard limb array, uint8.

    uint8 keeps the host->device copy at 1/4 the bytes (the tunnel moves
    ~50 MB/s; a 7-advice k=17 witness is 138 MB as int32, 34 MB as u8 —
    seconds of the advice phase). Device graphs cast to int32 on entry
    (to_mont_stack/to_mont_split)."""
    flat: list[int] = []
    for col in cols:
        flat.extend(col)
        flat.extend([0] * (n - len(col)))
    arr = np.asarray(ints_to_limbs_fast(flat), dtype=np.uint8)  # (L, B*n)
    B = len(cols)
    return np.ascontiguousarray(
        arr.reshape(arr.shape[0], B, n).transpose(1, 0, 2))


def create_proof(
    pk,
    advice_values: list,  # per advice column: list[int] of len <= usable rows
    instances: list,  # per instance column: list[int]
    lookup_fill: list | None = None,  # unused (kept for API compat)
    rng=os.urandom,
    scheme: str = "shplonk",  # "shplonk" (Blake2b path) | "gwc" (EVM path)
    transcript=None,
) -> bytes:
    cs = pk.vk.cs
    domain: Domain = pk.vk.domain
    n = domain.n
    usable = cs.usable_rows(n)
    u = usable  # boundary row: z's final value; data occupies [0, usable)
    omega = domain.omega
    t = transcript if transcript is not None else Blake2bWrite()
    pk.vk.hash_into(t)
    fp = _fused_for(pk)
    na, ni, nz, nlk = fp.na, fp.ni, fp.nz, fp.nlk

    # --- instances (absorbed as scalars) + phase 1: advice commitments ---
    with _Span("advice encode+commit"):
        inst_cols = []
        for col in instances:
            vals = [v % R for v in col]
            for v in vals:
                t.common_scalar(v)
            inst_cols.append(vals)
        adv_cols = []
        for col in advice_values:
            vals = [v % R for v in col] + [0] * (usable - len(col))
            vals += [_rand_field(rng) for _ in range(n - usable)]
            adv_cols.append(vals)
        advice_stack, instance_stack = to_mont_split(
            jnp.asarray(_pack_std(adv_cols + inst_cols, n)), na)
        for pt in commit_lagrange_batch(pk.srs, advice_stack):
            t.write_point(pt)

    theta = t.squeeze_challenge()
    LAST_DEBUG.clear()
    LAST_DEBUG['theta'] = theta

    # --- phase 2: lookup permuted columns ---
    _lk_span = _Span("lookup permute+commit"); _lk_span.__enter__()
    lk_mont = jnp.zeros((0, 33, n), jnp.int32)
    lk_perm_mont = jnp.zeros((0, 33, n), jnp.int32)
    if nlk:
        lk_mont, lk_std = fp.lookup_compress(
            pk._fixed_lag_stack, advice_stack, instance_stack,
            _mont_const(theta))
        std_np = np.asarray(lk_std)  # ONE host pull for all lookups
        perm_cols_std = []
        for li in range(nlk):
            a_vals = limbs_to_ints_fast(std_np[2 * li])
            s_vals = limbs_to_ints_fast(std_np[2 * li + 1])
            a_p, s_p = _permute_lookup_pair(a_vals[:usable], s_vals[:usable])
            a_p += [_rand_field(rng) for _ in range(n - usable)]
            s_p += [_rand_field(rng) for _ in range(n - usable)]
            perm_cols_std.append(a_p)
            perm_cols_std.append(s_p)
        lk_perm_mont = to_mont_stack(
            jnp.asarray(_pack_std(perm_cols_std, n)))
        for pt in commit_lagrange_batch(pk.srs, lk_perm_mont):
            t.write_point(pt)
    _lk_span.__exit__()

    beta = t.squeeze_challenge()
    gamma = t.squeeze_challenge()
    LAST_DEBUG['beta'], LAST_DEBUG['gamma'] = beta, gamma
    beta_t = _mont_const(beta)
    gamma_t = _mont_const(gamma)

    # --- phases 3-5: grand products + random poly + batched commits ---
    with _Span("grand products + z commits"):
        rand_vals = [_rand_field(rng) for _ in range(n)]
        tail_len = n - usable - 1
        tails = [[_rand_field(rng) for _ in range(tail_len)]
                 for _ in range(nz + nlk)]
        random_std = jnp.asarray(_pack_std([rand_vals], n)[0])
        if nz + nlk:
            tails_std = (jnp.asarray(_pack_std(tails, tail_len))
                         if tail_len else
                         jnp.zeros((nz + nlk, 33, 0), jnp.int32))
            z_stack, random_lag, commit_stack = fp.grand_products(
                advice_stack, pk._fixed_lag_stack, instance_stack,
                pk._sigma_lag_stack, pk._omega_mont, beta_t, gamma_t,
                lk_mont, lk_perm_mont, tails_std, random_std)
        else:
            z_stack = jnp.zeros((0, 33, n), jnp.int32)
            commit_stack = to_mont_stack(random_std[None])
            random_lag = commit_stack[0]
        for pt in commit_lagrange_batch(pk.srs, commit_stack):
            t.write_point(pt)

    y = t.squeeze_challenge()
    LAST_DEBUG['y'] = y

    # --- phase 6: quotient ---
    _q_span = _Span("quotient (conversions + h)"); _q_span.__enter__()
    lag_stack = fp.lag_stack(advice_stack, instance_stack, z_stack,
                             lk_perm_mont, lk_mont, random_lag)
    coeff_stack = batched_l2c(domain.k, lag_stack)
    lag_stack = None
    # int16 residency: extended-domain limbs are lazy-bounded < 2^12, so
    # the (cols, L, ext_n) stack — the prover's biggest tensor — lives at
    # half width; the quotient graph upcasts on read. (The ES256 circuit
    # at k=17 OOMed a 16 GB chip with int32 residents.)
    ext_stack = batched_c2e(domain.k, domain.extended_k,
                            coeff_stack).astype(jnp.int16)
    h_pieces = fp.quotient(ext_stack, beta_t, gamma_t, _mont_const(y))
    ext_stack = None
    for pt in commit_coeff_batch(pk.srs, h_pieces):
        t.write_point(pt)
    _q_span.__exit__()

    x = t.squeeze_challenge()
    LAST_DEBUG['x'] = x

    # --- phase 7: evaluations (one fused graph + one host pull) ---
    _e_span = _Span("evaluations"); _e_span.__enter__()
    sq = cs.sorted_queries()
    plan = []  # (unified label, rot) in multiopen order
    for idx, rot in sq[CS.ADVICE]:
        plan.append(((CS.ADVICE, idx), rot))
    for idx, rot in sq[CS.FIXED]:
        plan.append(((CS.FIXED, idx), rot))
    for idx, rot in sq[CS.INSTANCE]:
        plan.append(((CS.INSTANCE, idx), rot))
    plan.append((("random",), 0))
    for j in range(fp.nsig):
        plan.append((("sigma", j), 0))
    for i in range(nz):
        plan.append((("perm_z", i), 0))
        plan.append((("perm_z", i), 1))
    for i in range(nz - 1):
        plan.append((("perm_z", i), u))
    for li in range(nlk):
        plan.append((("lookup_z", li), 0))
        plan.append((("lookup_z", li), 1))
        plan.append((("lookup_ap", li), 0))
        plan.append((("lookup_ap", li), -1))
        plan.append((("lookup_sp", li), 0))

    def rot_point(rot: int) -> int:
        if rot >= 0:
            return x * pow(omega, rot, R) % R
        return x * pow(pow(omega, -rot, R), R - 2, R) % R

    rots = sorted({rot for _, rot in plan} | {0})
    pts_np = np.concatenate(
        [np.asarray(SPEC.encode([rot_point(r)])) for r in rots], axis=1)
    xn = pow(x, n, R)
    ev_std, h_comb, h_ev_std = fp.evals(
        plan, rots, coeff_stack, pk._fixed_coeff_stack,
        pk._sigma_coeff_stack, h_pieces, jnp.asarray(pts_np),
        _mont_const(xn))
    ev_ints = limbs_to_ints_fast(np.asarray(ev_std))
    h_eval = limbs_to_ints_fast(np.asarray(h_ev_std).reshape(33, -1)[:, :1])[0]
    queries = []  # (label, rot, eval) in multiopen order
    for (label, rot), ev in zip(plan, ev_ints):
        queries.append((label, rot, ev))
        t.write_scalar(ev)
    queries.append((("h",), 0, h_eval))
    LAST_DEBUG['h_eval'] = h_eval
    LAST_DEBUG['evals'] = list(queries)
    _e_span.__exit__()

    # --- phase 8: batch opening ---
    with _Span("multiopen"):
        ucoeff = fp.unified_stack(coeff_stack, pk._fixed_coeff_stack,
                                  pk._sigma_coeff_stack, h_comb)
        if scheme == "shplonk":
            _shplonk_open(pk, fp, t, queries, rot_point, ucoeff)
        elif scheme == "gwc":
            _gwc_open(pk, fp, t, queries, rot_point, ucoeff)
        else:
            raise ValueError(f"unknown multiopen scheme {scheme!r}")
    return t.finalize()


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _permute_lookup_pair(a_vals: list[int], s_vals: list[int]):
    """halo2 permute_expression_pair: sort input; build table permutation."""
    a_sorted = sorted(a_vals)
    from collections import Counter

    leftover = Counter(s_vals)
    s_perm = [None] * len(a_sorted)
    for i, v in enumerate(a_sorted):
        if i == 0 or v != a_sorted[i - 1]:
            if leftover[v] == 0:
                raise ValueError(f"lookup failure: input value {v} not in table")
            leftover[v] -= 1
            s_perm[i] = v
    fill = iter(sorted(leftover.elements()))
    for i in range(len(s_perm)):
        if s_perm[i] is None:
            s_perm[i] = next(fill)
    return a_sorted, s_perm


def _shplonk_open(pk, fp: FusedPhases, t, queries, rot_point, ucoeff):
    """BDFG20 batch opening. queries: [(label, rot, eval_int)]."""
    # group queries by rotation set (host bookkeeping only)
    by_poly = []  # (label, {rot: eval})
    seen = {}
    for label, rot, ev in queries:
        if label not in seen:
            seen[label] = len(by_poly)
            by_poly.append((label, {}))
        by_poly[seen[label]][1][rot] = ev

    sets: dict[tuple, list] = {}
    for label, rmap in by_poly:
        rkey = tuple(sorted(rmap.keys()))
        sets.setdefault(rkey, []).append((label, rmap))
    set_list = sorted(sets.items(), key=lambda kv: kv[0])

    y_ch = t.squeeze_challenge()
    v_ch = t.squeeze_challenge()

    # per-set structure + host interpolations
    set_struct = []
    r_polys_list = []
    pts_list = []
    set_aux = []  # (pts, r_poly)
    for rkey, polys in set_list:
        members = tuple(fp.uidx(lbl) for lbl, _ in polys)
        set_struct.append((len(rkey), members))
        pts = [rot_point(r) for r in rkey]
        evs = []
        for r in rkey:
            acc = 0
            for _lbl, rmap in polys:
                acc = (acc * v_ch + rmap[r]) % R
            evs.append(acc)
        r_poly = _interp(pts, evs)
        set_aux.append((pts, r_poly))
        r_polys_list.append(jnp.asarray(np.asarray(SPEC.encode(r_poly))))
        pts_list.append(jnp.asarray(np.asarray(SPEC.encode(pts))))

    h_coeff, F_list = fp.shplonk_h(
        tuple(set_struct), ucoeff, _mont_const(v_ch), _mont_const(y_ch),
        r_polys_list, pts_list)
    t.write_point(commit_coeff(pk.srs, h_coeff))

    u_ch = t.squeeze_challenge()

    all_pts = sorted({p for pts, _ in set_aux for p in pts})
    z_t_u = 1
    for p_ in all_pts:
        z_t_u = z_t_u * (u_ch - p_) % R
    scales, rus = [], []
    for pts, r_poly in set_aux:
        z_s_u = 1
        for p_ in pts:
            z_s_u = z_s_u * (u_ch - p_) % R
        scales.append(z_t_u * pow(z_s_u, R - 2, R) % R)
        r_u = 0
        for c in reversed(r_poly):
            r_u = (r_u * u_ch + c) % R
        rus.append(r_u)
    W_coeff = fp.shplonk_w(
        len(set_list), F_list, h_coeff, _mont_const(y_ch),
        jnp.asarray(np.asarray(SPEC.encode(scales))),
        jnp.asarray(np.asarray(SPEC.encode(rus))),
        _mont_const(z_t_u), _mont_const(u_ch))
    t.write_point(commit_coeff(pk.srs, W_coeff))


def _gwc_open(pk, fp: FusedPhases, t, queries, rot_point, ucoeff):
    """GWC19 batch opening (the reference's EVM path: ProverGWC,
    ecdsa_p256.rs:365-373): one witness commitment per distinct point."""
    v = t.squeeze_challenge()
    groups: dict[int, list] = {}
    order: list[int] = []
    for label, rot, ev in queries:
        if rot not in groups:
            groups[rot] = []
            order.append(rot)
        groups[rot].append((label, ev))

    group_struct = []
    rcomb_list, zpt_list = [], []
    for rot in order:
        polys = groups[rot]
        group_struct.append(tuple(fp.uidx(lbl) for lbl, _ in polys))
        r_comb = 0
        for _lbl, ev in polys:
            r_comb = (r_comb * v + ev) % R
        rcomb_list.append(_mont_const(r_comb))
        zpt_list.append(_mont_const(rot_point(rot)))
    W_list = fp.gwc_w(tuple(group_struct), ucoeff, _mont_const(v),
                      rcomb_list, zpt_list)
    for W_coeff in W_list:
        t.write_point(commit_coeff(pk.srs, W_coeff))


def _interp(pts: list[int], evs: list[int]) -> list[int]:
    """Host Lagrange interpolation -> coefficient list (low-first)."""
    k = len(pts)
    coeffs = [0] * k
    for i in range(k):
        # basis poly prod_{j!=i} (X - x_j)/(x_i - x_j)
        num = [1]
        denom = 1
        for j in range(k):
            if j == i:
                continue
            num = _polymul(num, [(-pts[j]) % R, 1])
            denom = denom * (pts[i] - pts[j]) % R
        scale = evs[i] * pow(denom, R - 2, R) % R
        for d, c in enumerate(num):
            coeffs[d] = (coeffs[d] + c * scale) % R
    return coeffs


def _polymul(a, b):
    out = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            out[i + j] = (out[i + j] + ai * bj) % R
    return out


# ---------------------------------------------------------------------------
# quotient constraint graph (shared by fused.py)
# ---------------------------------------------------------------------------

def _quotient_core(cs: CS.ConstraintSystem, u: int, ratio: int,
                   offsets: dict, na: int, ni: int, nz: int, nlk: int,
                   chunks: int = 1):
    """Builds the h_ext evaluation over STACKED extended tensors (sliced
    in-graph, so no unstacked copies ever materialize in HBM).

    chunks > 1 (opt-in, WH2_QUOTIENT_CHUNKS): evaluate the gate system
    over the extended domain in `chunks` circular windows under lax.map.
    Every term is pointwise in the ext axis except rotations, which are
    rolls by rot*ratio — so a window [s, s+C) of a rolled tensor is just
    the circular window [s+rot*ratio, ...) of the source. Windowed
    gathers mean the per-constraint int32 temps are (33, ext_n/chunks)
    instead of (33, ext_n); residents can then stay int16 end-to-end
    (the full-width upcast of a 15-advice ES256 stack at k=17 is what
    OOMed the 16 GB chip — results/ROUND5.md §4)."""
    chunk_len = cs.permutation_chunk_len()
    perm_cols = cs.perm_columns
    adv_off, inst_off = offsets["adv"], offsets["inst"]
    z_off, lk_off = offsets["z"], offsets["lk"]

    def core(fixed_ext, sigma_ext, ext_stack, l0, llast, lblind, x_ext,
             zh_inv, beta_t, gamma_t, y_t):
        def _eval_h(get):
            return _quotient_body(
                cs, u, ratio, chunk_len, perm_cols, adv_off, inst_off,
                z_off, lk_off, na, ni, nz, nlk, fixed_ext, sigma_ext,
                ext_stack, l0, llast, lblind, x_ext, zh_inv, beta_t,
                gamma_t, y_t, get)

        if chunks == 1:
            def get(src, rot):
                return jnp.roll(src, -rot * ratio, axis=1) if rot else src

            return _eval_h(get)

        import jax

        ext_n = zh_inv.shape[-1]
        C = ext_n // chunks
        assert C * chunks == ext_n, (chunks, ext_n)

        def one_chunk(ci):
            idx0 = ci * C + jnp.arange(C)

            def get(src, rot):
                idx = (idx0 + rot * ratio) % ext_n if rot else idx0
                out = jnp.take(src, idx, axis=-1)
                # residents arrive int16 (lazy limbs < 2^12); upcast the
                # window, never the full tensor
                return out.astype(jnp.int32) if out.dtype != jnp.int32 else out

            return _eval_h(get)

        h = jax.lax.map(one_chunk, jnp.arange(chunks))  # (chunks, 33, C)
        return jnp.transpose(h, (1, 0, 2)).reshape(h.shape[1], ext_n)

    return core


def _quotient_body(cs, u, ratio, chunk_len, perm_cols, adv_off, inst_off,
                   z_off, lk_off, na, ni, nz, nlk, fixed_ext, sigma_ext,
                   ext_stack, l0, llast, lblind, x_ext, zh_inv, beta_t,
                   gamma_t, y_t, get):
    """One evaluation of the full gate system through a window/roll getter
    `get(src, rot)`. With the roll getter this is structurally the round-4
    graph; with a windowed getter it is one lax.map chunk. Rotated reads
    always go through `get` on the RAW source tensor (a window of a roll
    is a shifted circular window of the source)."""
    def col_getter_ext(kind, idx, rot):
        if kind == CS.FIXED:
            src_ = fixed_ext[idx]
        elif kind == CS.ADVICE:
            src_ = ext_stack[adv_off + idx]
        else:
            src_ = ext_stack[inst_off + idx]
        return get(src_, rot)

    def W(t):
        return get(t, 0)

    perm_z_raw = [ext_stack[z_off + i] for i in range(nz)]
    l0, llast, lblind = W(l0), W(llast), W(lblind)
    x_ext, zh_inv = W(x_ext), W(zh_inv)

    one_t = jnp.asarray(np.asarray(SPEC.one_mont).reshape(33, 1))
    active = M.sub(SPEC, one_t, M.add(SPEC, llast, lblind))

    constraints = []
    for _, g in cs.gates:
        constraints.append(CS.eval_device(g, col_getter_ext))
    if perm_cols:
        constraints.append(
            M.montmul(SPEC, l0, M.sub(SPEC, one_t, W(perm_z_raw[0])))
        )
        zl = W(perm_z_raw[-1])
        constraints.append(
            M.montmul(SPEC, llast, M.sub(SPEC, M.montsquare(SPEC, zl), zl))
        )
        for i in range(1, nz):
            constraints.append(
                M.montmul(
                    SPEC, l0,
                    M.sub(SPEC, W(perm_z_raw[i]), get(perm_z_raw[i - 1], u)),
                )
            )
        for ci, cstart in enumerate(range(0, len(perm_cols), chunk_len)):
            chunk = list(
                range(cstart, min(cstart + chunk_len, len(perm_cols)))
            )
            left = get(perm_z_raw[ci], 1)
            right = W(perm_z_raw[ci])
            for j in chunk:
                kind, idx = perm_cols[j]
                v = col_getter_ext(kind, idx, 0)
                delta_j = pow(BN254_FR_DELTA, j, R)
                dj_t = jnp.asarray(SPEC.encode([delta_j]), dtype=jnp.int32)
                idv = M.montmul(SPEC, dj_t, x_ext)
                left = M.montmul(
                    SPEC, left,
                    M.add(SPEC, M.add(SPEC, v, M.montmul(SPEC, beta_t, W(sigma_ext[j]))), gamma_t),
                )
                right = M.montmul(
                    SPEC, right,
                    M.add(SPEC, M.add(SPEC, v, M.montmul(SPEC, beta_t, idv)), gamma_t),
                )
            constraints.append(
                M.montmul(SPEC, active, M.sub(SPEC, left, right))
            )
    for li in range(nlk):
        z_src = ext_stack[lk_off + 5 * li]
        ap_src = ext_stack[lk_off + 5 * li + 1]
        z_e = W(z_src)
        z_n = get(z_src, 1)
        ap = W(ap_src)
        sp = W(ext_stack[lk_off + 5 * li + 2])
        inp = W(ext_stack[lk_off + 5 * li + 3])
        tab = W(ext_stack[lk_off + 5 * li + 4])
        ap_prev = get(ap_src, -1)
        constraints.append(M.montmul(SPEC, l0, M.sub(SPEC, one_t, z_e)))
        constraints.append(
            M.montmul(SPEC, llast, M.sub(SPEC, M.montsquare(SPEC, z_e), z_e))
        )
        lhs = M.montmul(
            SPEC, z_n,
            M.montmul(SPEC, M.add(SPEC, ap, beta_t), M.add(SPEC, sp, gamma_t)),
        )
        rhs = M.montmul(
            SPEC, z_e,
            M.montmul(
                SPEC, M.add(SPEC, inp, beta_t),
                M.add(SPEC, tab, gamma_t),
            ),
        )
        constraints.append(M.montmul(SPEC, active, M.sub(SPEC, lhs, rhs)))
        constraints.append(
            M.montmul(
                SPEC, active,
                M.montmul(SPEC, M.sub(SPEC, ap, sp), M.sub(SPEC, ap, ap_prev)),
            )
        )
        constraints.append(M.montmul(SPEC, l0, M.sub(SPEC, ap, sp)))

    h_ext = constraints[0]
    for c in constraints[1:]:
        h_ext = M.add(SPEC, M.montmul(SPEC, h_ext, y_t), c)
    return M.montmul(SPEC, h_ext, zh_inv)
