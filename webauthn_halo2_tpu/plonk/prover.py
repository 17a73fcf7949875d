"""The PLONKish prover: create_proof (KZG + SHPLONK + Blake2b transcript).

TPU-native replacement for `halo2_proofs::plonk::create_proof`
(reference hot path, SURVEY §3.2). Protocol phases follow the PSE halo2
structure: advice commits -> theta -> lookup permuted commits ->
beta/gamma -> permutation & lookup grand products -> vanishing random poly
-> y -> quotient pieces -> x -> evaluations -> SHPLONK multiopen (v/y
challenges, H commitment, u challenge, final witness W).

All polynomial arithmetic runs on device over (L, n) Montgomery limb
tensors; the transcript, the lookup permuted-pair construction, and the
tiny interpolations are host-side.
"""
from __future__ import annotations

import os
import sys
import time as _time
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..fields.constants import BN254_FR, BN254_FR_DELTA
from ..fields.limbs import FR_SPEC, ints_to_limbs_fast, limbs_to_ints_fast
from ..ops import ec as E
from ..ops import modops as M
from ..ops import poly as P
from ..ops.msm import msm
from . import cs as CS
from .domain import COSET_GEN, Domain
from .keygen import (ProvingKey, commit_coeff, commit_coeff_batch,
                     commit_lagrange, commit_lagrange_batch, encode_column)
from .transcript import Blake2bWrite

R = BN254_FR
SPEC = FR_SPEC

# conformance/debug capture of the last proof's internals (tests only)
LAST_DEBUG: dict = {}


class _Span:
    """Phase span timer (ark-std start_timer!/end_timer! parity, SURVEY §5.1).

    Enabled with WH2_TRACE=1; blocks on device completion at span ends so
    the numbers attribute real device time to each phase."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = _time.time()
        return self

    def __exit__(self, *a):
        if os.environ.get("WH2_TRACE"):
            # a fresh tiny computation completes only after everything
            # already enqueued on the (single) device stream
            jnp.zeros(1).block_until_ready()
            print(f"[span] {self.name}: {_time.time()-self.t0:.3f}s",
                  file=sys.stderr, flush=True)


def _rand_field(rng) -> int:
    return int.from_bytes(rng(32), "little") % R


def decode_column(col_mont: jnp.ndarray) -> list[int]:
    """Device Montgomery tensor -> host canonical ints."""
    std = M.normalize(SPEC, M.from_mont(SPEC, col_mont))
    return limbs_to_ints_fast(np.asarray(std))


def _mont_const(v: int) -> jnp.ndarray:
    return jnp.asarray(SPEC.encode([v]), dtype=jnp.int32)  # (L, 1)


def _eval_to_int(t: jnp.ndarray) -> int:
    return SPEC.decode(np.asarray(t.reshape(33, -1)[:, :1]))[0]


@dataclass
class _Queries:
    """Accumulates (coeff_poly, commitment_label, rotation, eval) opens."""

    def __init__(self):
        self.items = []  # (coeffs (L,n), rot:int, eval:int)

    def add(self, coeffs, rot, ev):
        self.items.append((coeffs, rot, ev))


def create_proof(
    pk: ProvingKey,
    advice_values: list,  # per advice column: list[int] of len <= usable rows
    instances: list,  # per instance column: list[int]
    lookup_fill: list | None = None,  # per lookup: default table fill value
    rng=os.urandom,
    scheme: str = "shplonk",  # "shplonk" (Blake2b path) | "gwc" (EVM path)
    transcript=None,
) -> bytes:
    cs = pk.vk.cs
    domain: Domain = pk.vk.domain
    n = domain.n
    ext_n = domain.ext_n
    ratio = ext_n // n
    usable = cs.usable_rows(n)
    u = usable  # boundary row: z's final value; data occupies [0, usable)
    omega = domain.omega
    t = transcript if transcript is not None else Blake2bWrite()
    pk.vk.hash_into(t)

    # --- instances (absorbed as scalars; none in the ECDSA circuit) ---
    instance_lag = []
    for col in instances:
        vals = [v % R for v in col] + [0] * (n - len(col))
        for v in vals[: len(col)]:
            t.common_scalar(v)
        instance_lag.append(encode_column(vals))

    # --- phase 1: advice commitments (one batched MSM dispatch) ---
    with _Span("advice commit"):
        advice_lag = []
        for col in advice_values:
            vals = [v % R for v in col] + [0] * (usable - len(col))
            vals += [_rand_field(rng) for _ in range(n - usable)]
            advice_lag.append(encode_column(vals))
        for pt in commit_lagrange_batch(pk.srs, advice_lag):
            t.write_point(pt)

    theta = t.squeeze_challenge()
    LAST_DEBUG.clear()
    LAST_DEBUG['theta'] = theta

    # --- phase 2: lookup permuted columns ---
    def col_getter_lag(kind, idx, rot):
        src = {
            CS.FIXED: pk.fixed_lagrange,
            CS.ADVICE: advice_lag,
            CS.INSTANCE: instance_lag,
        }[kind][idx]
        return jnp.roll(src, -rot, axis=1) if rot else src

    _lk_span = _Span("lookup permute+commit"); _lk_span.__enter__()
    lookups = []  # dicts with device tensors
    for lk in cs.lookups:
        comp_in = _compress(lk.inputs, col_getter_lag, theta)
        comp_tab = _compress(lk.tables, col_getter_lag, theta)
        a_vals = decode_column(comp_in)
        s_vals = decode_column(comp_tab)
        a_p, s_p = _permute_lookup_pair(a_vals[:usable], s_vals[:usable])
        # blind the tails
        a_p += [_rand_field(rng) for _ in range(n - usable)]
        s_p += [_rand_field(rng) for _ in range(n - usable)]
        a_p_lag = encode_column(a_p)
        s_p_lag = encode_column(s_p)
        lookups.append(
            dict(comp_in=comp_in, comp_tab=comp_tab, a_p=a_p_lag, s_p=s_p_lag)
        )
    if lookups:
        perm_cols_flat = [c for l in lookups for c in (l["a_p"], l["s_p"])]
        for pt in commit_lagrange_batch(pk.srs, perm_cols_flat):
            t.write_point(pt)

    _lk_span.__exit__()
    beta = t.squeeze_challenge()
    gamma = t.squeeze_challenge()
    LAST_DEBUG['beta'], LAST_DEBUG['gamma'] = beta, gamma
    beta_t = _mont_const(beta)
    gamma_t = _mont_const(gamma)

    # --- phase 3: permutation grand products (chunked) ---
    chunk_len = cs.permutation_chunk_len()
    perm_cols = cs.perm_columns
    perm_zs = []
    carry_in = 1  # z chains across chunks
    if not hasattr(pk, "_omega_mont"):
        std = jnp.asarray(ints_to_limbs_fast([int(v) for v in pk.omega_pows_np]))
        pk._omega_mont = M.to_mont(SPEC, std)
    omega_pows_mont = pk._omega_mont
    for cstart in range(0, len(perm_cols), chunk_len):
        chunk = list(range(cstart, min(cstart + chunk_len, len(perm_cols))))
        num = None
        den = None
        for j in chunk:
            kind, idx = perm_cols[j]
            vcol = col_getter_lag(kind, idx, 0)
            delta_j = pow(BN254_FR_DELTA, j, R)
            idv = M.montmul(SPEC, _mont_const(delta_j), omega_pows_mont)
            sig = pk.sigma_lagrange[j]
            nterm = M.add(SPEC, M.add(SPEC, vcol, M.montmul(SPEC, beta_t, idv)), gamma_t)
            dterm = M.add(SPEC, M.add(SPEC, vcol, M.montmul(SPEC, beta_t, sig)), gamma_t)
            num = nterm if num is None else M.montmul(SPEC, num, nterm)
            den = dterm if den is None else M.montmul(SPEC, den, dterm)
        z = _grand_product(num, den, usable, carry_in, rng)
        carry_in = decode_column(z[:, u : u + 1])[0]  # boundary value only
        perm_zs.append(z)

    # --- phase 4: lookup grand products ---
    for lkd in lookups:
        a_beta = M.add(SPEC, lkd["comp_in"], beta_t)
        s_gamma = M.add(SPEC, lkd["comp_tab"], gamma_t)
        ap_beta = M.add(SPEC, lkd["a_p"], beta_t)
        sp_gamma = M.add(SPEC, lkd["s_p"], gamma_t)
        num = M.montmul(SPEC, a_beta, s_gamma)
        den = M.montmul(SPEC, ap_beta, sp_gamma)
        z = _grand_product(num, den, usable, 1, rng)
        lkd["z"] = z

    # --- phase 5: vanishing random polynomial + batched z commits ---
    rand_vals = [_rand_field(rng) for _ in range(n)]
    random_lag = encode_column(rand_vals)
    random_coeff = domain.lagrange_to_coeff(random_lag)
    with _Span("grand products + z commits"):
        z_cols = perm_zs + [lkd["z"] for lkd in lookups] + [random_lag]
        for pt in commit_lagrange_batch(pk.srs, z_cols):
            t.write_point(pt)

    y = t.squeeze_challenge()
    LAST_DEBUG['y'] = y

    # --- phase 6: quotient ---
    # Batch ALL basis conversions into two vmapped dispatches, and keep the
    # extended-domain polys ONLY as one stacked tensor: XLA slicing makes
    # copies, so unstacking 23 x (L, 4n) tensors would double ~1.5 GB of
    # HBM (the round-1 OOM). The quotient jit slices the stacks internally.
    _q_span = _Span("quotient (conversions + h)"); _q_span.__enter__()
    na = len(advice_lag)
    ni = len(instance_lag)
    nz = len(perm_zs)
    nlk = len(lookups)
    lag_stack = jnp.stack(
        advice_lag + instance_lag + perm_zs
        + [lkd[k] for lkd in lookups for k in
           ("z", "a_p", "s_p", "comp_in", "comp_tab")]
        + [random_lag]
    )
    # free the per-poly Lagrange tensors (values live on in lag_stack)
    advice_lag.clear()
    perm_zs.clear()
    for lkd in lookups:
        lkd["z"] = lkd["a_p"] = lkd["s_p"] = None
        lkd["comp_in"] = lkd["comp_tab"] = None
    random_lag = None
    coeff_stack = _batched_l2c(domain, lag_stack)
    lag_stack = None
    ext_stack = _batched_c2e(domain, coeff_stack)
    random_coeff = coeff_stack[na + ni + nz + 5 * nlk]

    offsets = dict(adv=0, inst=na, z=na + ni, lk=na + ni + nz)
    qfn = _quotient_fn(cs, u, ratio, offsets, na, ni, nz, nlk)
    h_ext = qfn(
        pk.fixed_ext, pk.sigma_ext, ext_stack,
        pk.l0_ext, pk.llast_ext, pk.lblind_ext, pk.x_ext,
        jnp.asarray(domain.zh_inv_extended_np()),
        beta_t, gamma_t, _mont_const(y),
    )
    ext_stack = None
    h_coeff = domain.extended_to_coeff(h_ext)

    # quotient degree < (d-1)*n: exactly d-1 pieces of n coefficients
    # (the padding pieces up to ext_n/n are identically zero)
    num_pieces = cs.degree() - 1
    h_pieces = [h_coeff[:, i * n : (i + 1) * n] for i in range(num_pieces)]
    for pt in commit_coeff_batch(pk.srs, h_pieces):
        t.write_point(pt)
    _q_span.__exit__()

    x = t.squeeze_challenge()
    LAST_DEBUG['x'] = x
    x_t = _mont_const(x)
    xpow = P.power_table(SPEC, x_t, n)

    # --- phase 7: evaluations ---
    queries = []  # (coeffs, rotation, eval_int) in multiopen order

    # collect the full opening schedule, then evaluate everything in ONE
    # batched device call (SURVEY §3.2's transcript-absorb phase)
    sq = cs.sorted_queries()
    nz = len([1 for _ in range(cs.num_perm_chunks())])
    z_base = offsets["z"]
    lk_base = offsets["lk"]
    plan = []  # (source, rot): source = ("stack", i) | ("arr", tensor)
    for idx, rot in sq[CS.ADVICE]:
        plan.append((("stack", idx), rot))
    for idx, rot in sq[CS.FIXED]:
        plan.append((("arr", pk.fixed_coeff[idx]), rot))
    for idx, rot in sq[CS.INSTANCE]:
        plan.append((("stack", offsets["inst"] + idx), rot))
    plan.append((("stack", lk_base + 5 * nlk), 0))  # random poly
    for j in range(len(pk.sigma_coeff)):
        plan.append((("arr", pk.sigma_coeff[j]), 0))
    for i in range(nz):
        plan.append((("stack", z_base + i), 0))
        plan.append((("stack", z_base + i), 1))
    for i in range(nz - 1):
        plan.append((("stack", z_base + i), u))
    for li in range(nlk):
        plan.append((("stack", lk_base + 5 * li), 0))
        plan.append((("stack", lk_base + 5 * li), 1))
        plan.append((("stack", lk_base + 5 * li + 1), 0))
        plan.append((("stack", lk_base + 5 * li + 1), -1))
        plan.append((("stack", lk_base + 5 * li + 2), 0))

    _poly_cache: dict = {}

    def _poly_of(source):
        kind_, v = source
        key = (kind_, v) if kind_ == "stack" else (kind_, id(v))
        if key not in _poly_cache:
            _poly_cache[key] = coeff_stack[v] if kind_ == "stack" else v
        return _poly_cache[key]

    rots = sorted({rot for _, rot in plan})
    pow_tables = {}
    for rot in rots:
        point = x * pow(omega, rot, R) % R if rot >= 0 else (
            x * pow(pow(omega, -rot, R), R - 2, R) % R
        )
        pow_tables[rot] = (
            xpow if rot == 0 else P.power_table(SPEC, _mont_const(point), n)
        )
    _e_span = _Span("evaluations"); _e_span.__enter__()
    stacked = jnp.stack([_poly_of(s) for s, _ in plan], axis=1)  # (L, Q, n)
    pows = jnp.stack([pow_tables[rot] for _, rot in plan], axis=1)
    evals_dev = M.normalize(SPEC, M.from_mont(
        SPEC, P.mod_sum(SPEC, M.montmul(SPEC, stacked, pows))[..., 0]
    ))
    ev_ints = limbs_to_ints_fast(np.asarray(evals_dev))
    stacked = pows = None
    for (source, rot), ev in zip(plan, ev_ints):
        queries.append((_poly_of(source), rot, ev))
        t.write_scalar(ev)

    # combined quotient poly sum_i x^{n i} h_i, opened at x (eval not written:
    # the verifier recomputes the expected value from the other openings)
    xn = pow(x, n, R)
    h_combined = h_pieces[-1]
    for piece in reversed(h_pieces[:-1]):
        h_combined = M.add(
            SPEC, M.montmul(SPEC, h_combined, _mont_const(xn)), piece
        )
    h_eval = _eval_to_int(P.eval_at(SPEC, h_combined, xpow))
    LAST_DEBUG['h_eval'] = h_eval
    LAST_DEBUG['evals'] = [(id(c), rot, ev) for c, rot, ev in queries]
    queries.append((h_combined, 0, h_eval))

    _e_span.__exit__()
    # --- phase 8: batch opening ---
    with _Span("multiopen"):
        if scheme == "shplonk":
            _shplonk_open(pk, t, queries, x, domain)
        elif scheme == "gwc":
            _gwc_open(pk, t, queries, x, domain)
        else:
            raise ValueError(f"unknown multiopen scheme {scheme!r}")
    return t.finalize()


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _compress(exprs, getter, theta: int) -> jnp.ndarray:
    acc = None
    th = _mont_const(theta)
    for e in exprs:
        v = CS.eval_device(e, getter)
        acc = v if acc is None else M.add(SPEC, M.montmul(SPEC, acc, th), v)
    return acc


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


def _grand_product(num, den, usable: int, carry_in: int, rng) -> jnp.ndarray:
    """z[0] = carry_in; z[i+1] = z[i] * num[i]/den[i] on active rows."""
    import functools
    import jax

    n = num.shape[1]
    den_inv = M.batch_inverse(SPEC, den, axis=1)
    ratio = M.montmul(SPEC, num, den_inv)
    # force ratio = 1 outside the active rows [0, usable)
    one_b = jnp.broadcast_to(
        jnp.asarray(np.asarray(SPEC.one_mont).reshape(33, 1)), ratio.shape
    )
    mask = (jnp.arange(n) < usable)[None, :]
    ratio = jnp.where(mask, ratio, one_b)
    incl = jax.lax.associative_scan(
        functools.partial(M.montmul, SPEC), ratio, axis=1
    )
    z = jnp.concatenate([one_b[:, :1], incl[:, :-1]], axis=1)
    z = M.montmul(SPEC, _mont_const(carry_in), z)
    # blind tail rows strictly beyond the boundary row `usable`
    tail = [int.from_bytes(rng(32), "little") % R for _ in range(n - usable - 1)]
    if tail:
        tail_t = jnp.asarray(SPEC.encode(tail))
        z = z.at[:, usable + 1:].set(tail_t)
    return z


def _shplonk_open(pk: ProvingKey, t: Blake2bWrite, queries, x: int, domain: Domain):
    """BDFG20 batch opening. queries: [(coeffs, rot, eval_int)]."""
    n = domain.n
    omega = domain.omega

    def rot_point(rot: int) -> int:
        if rot >= 0:
            return x * pow(omega, rot, R) % R
        return x * pow(pow(omega, -rot, R), R - 2, R) % R

    # group queries by rotation set
    by_poly = []  # (coeffs, {rot: eval})
    seen = {}
    for coeffs, rot, ev in queries:
        key = id(coeffs)
        if key not in seen:
            seen[key] = len(by_poly)
            by_poly.append((coeffs, {}))
        by_poly[seen[key]][1][rot] = ev

    sets: dict[tuple, list] = {}
    for coeffs, rmap in by_poly:
        rkey = tuple(sorted(rmap.keys()))
        sets.setdefault(rkey, []).append((coeffs, rmap))

    set_list = sorted(sets.items(), key=lambda kv: kv[0])
    y_ch = t.squeeze_challenge()
    v_ch = t.squeeze_challenge()
    y_t = _mont_const(y_ch)
    v_t = _mont_const(v_ch)

    # per set: F_s = sum_j v^j f_j ; R_s = interpolation of combined evals
    coset_pows = None
    h_total = None  # evals on coset of size n
    xs_coset = _coset_points_cached(domain.k)
    set_data = []
    for s_i, (rkey, polys) in enumerate(set_list):
        F = None
        for coeffs, _ in polys:
            F = coeffs if F is None else M.add(SPEC, M.montmul(SPEC, F, v_t), coeffs)
        # combined evals r_j at each point of the set (v-weighted, same order)
        pts = [rot_point(r) for r in rkey]
        evs = []
        for pi, r in enumerate(rkey):
            acc = 0
            for coeffs, rmap in polys:
                acc = (acc * v_ch + rmap[r]) % R
            evs.append(acc)
        r_poly = _interp(pts, evs)  # host coeffs, deg < len(pts)
        set_data.append((rkey, F, pts, evs, r_poly))

        # evaluate (F - R)/Z_s on the size-n coset
        F_cos = _to_coset_evals(domain, F)
        r_cos = _poly_eval_coset(domain, r_poly)
        num = M.sub(SPEC, F_cos, r_cos)
        zs_cos = _vanishing_coset(domain, pts)
        num = M.montmul(SPEC, num, M.batch_inverse(SPEC, zs_cos, axis=1))
        h_total = num if h_total is None else M.add(
            SPEC, M.montmul(SPEC, h_total, y_t), num
        )
    # NOTE: Horner order means h_total = sum_s y^(S-1-s) * term_s; we use the
    # same ordering below for L, so the two sides stay consistent.
    h_coeff = _from_coset_evals(domain, h_total)
    t.write_point(commit_coeff(pk.srs, h_coeff))

    u_ch = t.squeeze_challenge()

    # L(X) = sum_s y^pow * (Z_T(u)/Z_s(u)) (F_s(X) - R_s(u)) - Z_T(u) H(X)
    all_pts = sorted({p for _, _, pts, _, _ in set_data for p in pts})
    z_t_u = 1
    for p_ in all_pts:
        z_t_u = z_t_u * (u_ch - p_) % R
    L_poly = None
    for s_i, (rkey, F, pts, evs, r_poly) in enumerate(set_data):
        z_s_u = 1
        for p_ in pts:
            z_s_u = z_s_u * (u_ch - p_) % R
        scale = z_t_u * pow(z_s_u, R - 2, R) % R
        r_u = 0
        for c in reversed(r_poly):
            r_u = (r_u * u_ch + c) % R
        term = M.montmul(SPEC, _mont_const(scale), F)
        term = term.at[:, 0:1].set(
            M.sub(
                SPEC,
                term[:, 0:1],
                M.montmul(SPEC, _mont_const(scale), _mont_const(r_u)),
            )
        )
        L_poly = term if L_poly is None else M.add(
            SPEC, M.montmul(SPEC, L_poly, y_t), term
        )
    # subtract Z_T(u) * H
    L_poly = M.sub(
        SPEC, L_poly, M.montmul(SPEC, _mont_const(z_t_u), h_coeff)
    )
    # witness W = L / (X - u): divide on the coset
    L_cos = _to_coset_evals(domain, L_poly)
    den = M.sub(SPEC, xs_coset, jnp.broadcast_to(_mont_const(u_ch), xs_coset.shape))
    W_cos = M.montmul(SPEC, L_cos, M.batch_inverse(SPEC, den, axis=1))
    W_coeff = _from_coset_evals(domain, W_cos)
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


import functools as _ft


@_ft.lru_cache(maxsize=8)
def _coset_points_cached(k: int):
    return _coset_points(Domain(k, k))


def _coset_points(domain: Domain) -> jnp.ndarray:
    n = domain.n
    g = COSET_GEN
    w = domain.omega
    xs = []
    acc = g
    for _ in range(n):
        xs.append(acc)
        acc = acc * w % R
    return jnp.asarray(SPEC.encode(xs))


def _to_coset_evals(domain: Domain, coeffs: jnp.ndarray) -> jnp.ndarray:
    from ..ops import ntt as N

    return N.ntt(SPEC, N.coset_shift(SPEC, coeffs, COSET_GEN), domain.k)


def _from_coset_evals(domain: Domain, evals: jnp.ndarray) -> jnp.ndarray:
    from ..ops import ntt as N

    ginv = pow(COSET_GEN, R - 2, R)
    return N.coset_shift(SPEC, N.intt(SPEC, evals, domain.k), ginv)


def _poly_eval_coset(domain: Domain, coeffs_host: list[int]) -> jnp.ndarray:
    """Evaluate a tiny host poly on the size-n coset (device)."""
    n = domain.n
    pad = coeffs_host + [0] * (n - len(coeffs_host))
    c = jnp.asarray(SPEC.encode(pad))
    return _to_coset_evals(domain, c)


def _vanishing_coset(domain: Domain, pts: list[int]) -> jnp.ndarray:
    """Z_s(X) = prod (X - p) evaluated on the coset."""
    xs = _coset_points_cached(domain.k)
    acc = None
    for p_ in pts:
        term = M.sub(SPEC, xs, jnp.broadcast_to(_mont_const(p_), xs.shape))
        acc = term if acc is None else M.montmul(SPEC, acc, term)
    return acc


# ---------------------------------------------------------------------------
# quotient construction (single jitted graph: one device dispatch per proof)
# ---------------------------------------------------------------------------

_QUOTIENT_CACHE: dict = {}


def _quotient_fn(cs: CS.ConstraintSystem, u: int, ratio: int,
                 offsets: dict, na: int, ni: int, nz: int, nlk: int):
    """Jitted h_ext builder over STACKED extended tensors (sliced in-graph,
    so no unstacked copies ever materialize in HBM), cached per cs."""
    key = (id(cs), u, ratio, na, ni, nz, nlk)
    if key in _QUOTIENT_CACHE:
        return _QUOTIENT_CACHE[key]

    import jax

    chunk_len = cs.permutation_chunk_len()
    perm_cols = cs.perm_columns
    adv_off, inst_off = offsets["adv"], offsets["inst"]
    z_off, lk_off = offsets["z"], offsets["lk"]

    def core(fixed_ext, sigma_ext, ext_stack, l0, llast, lblind, x_ext,
             zh_inv, beta_t, gamma_t, y_t):
        def col_getter_ext(kind, idx, rot):
            if kind == CS.FIXED:
                src_ = fixed_ext[idx]
            elif kind == CS.ADVICE:
                src_ = ext_stack[adv_off + idx]
            else:
                src_ = ext_stack[inst_off + idx]
            return jnp.roll(src_, -rot * ratio, axis=1) if rot else src_

        def rot_ext(tensor, rot):
            return jnp.roll(tensor, -rot * ratio, axis=1)

        perm_z_ext = [ext_stack[z_off + i] for i in range(nz)]
        lk_ext = [
            dict(
                z=ext_stack[lk_off + 5 * li],
                a_p=ext_stack[lk_off + 5 * li + 1],
                s_p=ext_stack[lk_off + 5 * li + 2],
                inp=ext_stack[lk_off + 5 * li + 3],
                tab=ext_stack[lk_off + 5 * li + 4],
            )
            for li in range(nlk)
        ]

        one_t = jnp.asarray(np.asarray(SPEC.one_mont).reshape(33, 1))
        active = M.sub(SPEC, one_t, M.add(SPEC, llast, lblind))

        constraints = []
        for _, g in cs.gates:
            constraints.append(CS.eval_device(g, col_getter_ext))
        if perm_cols:
            constraints.append(
                M.montmul(SPEC, l0, M.sub(SPEC, one_t, perm_z_ext[0]))
            )
            zl = perm_z_ext[-1]
            constraints.append(
                M.montmul(SPEC, llast, M.sub(SPEC, M.montsquare(SPEC, zl), zl))
            )
            for i in range(1, len(perm_z_ext)):
                constraints.append(
                    M.montmul(
                        SPEC, l0,
                        M.sub(SPEC, perm_z_ext[i], rot_ext(perm_z_ext[i - 1], u)),
                    )
                )
            for ci, cstart in enumerate(range(0, len(perm_cols), chunk_len)):
                chunk = list(
                    range(cstart, min(cstart + chunk_len, len(perm_cols)))
                )
                left = rot_ext(perm_z_ext[ci], 1)
                right = perm_z_ext[ci]
                for j in chunk:
                    kind, idx = perm_cols[j]
                    v = col_getter_ext(kind, idx, 0)
                    delta_j = pow(BN254_FR_DELTA, j, R)
                    idv = M.montmul(SPEC, _mont_const(delta_j), x_ext)
                    left = M.montmul(
                        SPEC, left,
                        M.add(SPEC, M.add(SPEC, v, M.montmul(SPEC, beta_t, sigma_ext[j])), gamma_t),
                    )
                    right = M.montmul(
                        SPEC, right,
                        M.add(SPEC, M.add(SPEC, v, M.montmul(SPEC, beta_t, idv)), gamma_t),
                    )
                constraints.append(
                    M.montmul(SPEC, active, M.sub(SPEC, left, right))
                )
        for lkd in lk_ext:
            z_e = lkd["z"]
            z_n = rot_ext(z_e, 1)
            ap = lkd["a_p"]
            sp = lkd["s_p"]
            ap_prev = rot_ext(ap, -1)
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
                    SPEC, M.add(SPEC, lkd["inp"], beta_t),
                    M.add(SPEC, lkd["tab"], gamma_t),
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

    fn = core if os.environ.get("WH2_DEBUG_QUOTIENT") else jax.jit(core)
    _QUOTIENT_CACHE[key] = fn
    return fn


def _gwc_open(pk: ProvingKey, t, queries, x: int, domain: Domain):
    """GWC19 batch opening (the reference's EVM path: ProverGWC,
    ecdsa_p256.rs:365-373): one witness commitment per distinct point.

    v combines the polys within each point group; the verifier's u folds
    the per-point pairings into one 2-pairing check.
    """
    omega = domain.omega

    def rot_point(rot: int) -> int:
        if rot >= 0:
            return x * pow(omega, rot, R) % R
        return x * pow(pow(omega, -rot, R), R - 2, R) % R

    v = t.squeeze_challenge()
    # group queries by rotation, preserving first-occurrence order
    groups: dict[int, list] = {}
    order: list[int] = []
    for coeffs, rot, ev in queries:
        if rot not in groups:
            groups[rot] = []
            order.append(rot)
        groups[rot].append((coeffs, ev))

    xs_coset = _coset_points_cached(domain.k)
    for rot in order:
        polys = groups[rot]
        F = None
        r_comb = 0
        for coeffs, ev in polys:
            F = coeffs if F is None else M.add(
                SPEC, M.montmul(SPEC, F, _mont_const(v)), coeffs
            )
            r_comb = (r_comb * v + ev) % R
        z = rot_point(rot)
        F = F.at[:, 0:1].set(M.sub(SPEC, F[:, 0:1], _mont_const(r_comb)))
        F_cos = _to_coset_evals(domain, F)
        den = M.sub(
            SPEC, xs_coset, jnp.broadcast_to(_mont_const(z), xs_coset.shape)
        )
        W_cos = M.montmul(SPEC, F_cos, M.batch_inverse(SPEC, den, axis=1))
        W_coeff = _from_coset_evals(domain, W_cos)
        t.write_point(commit_coeff(pk.srs, W_coeff))


import jax as _jax


_CONV_CHUNK = 6  # polys per vmapped conversion call: bounds the transient
# NTT working set to ~chunk * (L, 4n) * a-few-stage-buffers (HBM is 16 GB)


def _pad_chunk(stack: jnp.ndarray):
    """Pad the poly axis to a multiple of _CONV_CHUNK so every vmapped
    conversion dispatch shares ONE compiled shape (remote compiles are the
    dominant one-time cost under the tunneled backend)."""
    m = stack.shape[0]
    pad = (-m) % _CONV_CHUNK
    if pad:
        # tile the source so padding works even when m < pad
        reps = -(-pad // m)
        filler = jnp.concatenate([stack] * reps, axis=0)[:pad]
        stack = jnp.concatenate([stack, filler], axis=0)
    return stack, m


def _batched_l2c(domain: Domain, stack: jnp.ndarray) -> jnp.ndarray:
    """(m, L, n) lagrange stack -> coeff stack, chunked vmapped dispatches."""
    from ..ops import ntt as N

    stack, m = _pad_chunk(stack)
    fn = _jax.vmap(lambda a: N.intt(SPEC, a, domain.k))
    outs = [fn(stack[i : i + _CONV_CHUNK])
            for i in range(0, stack.shape[0], _CONV_CHUNK)]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out[:m]


def _batched_c2e(domain: Domain, stack: jnp.ndarray) -> jnp.ndarray:
    stack, m = _pad_chunk(stack)
    fn = _jax.vmap(lambda a: domain.coeff_to_extended(a))
    outs = [fn(stack[i : i + _CONV_CHUNK])
            for i in range(0, stack.shape[0], _CONV_CHUNK)]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out[:m]
