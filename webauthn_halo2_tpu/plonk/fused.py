"""Fused prover phase graphs: one device dispatch per transcript segment.

The tunneled `axon` TPU backend pays ~4 ms of latency per dispatch and
~40 s of remote XLA compile per distinct graph, and does not restore
compiles from the JAX persistent cache. The round-1/2 prover — eager limb
ops between many small jits — therefore spent minutes of pure dispatch
latency per proof and >20 minutes of compiles per process (the driver-
bench rc=124 failure mode, BENCH_r01/r02).

This module restructures `create_proof` (prover.py) so that every
segment between transcript interactions is ONE jitted graph, wrapped in
the AOT executable disk cache (utils/aot_cache). Per proof the device
sees ~a dozen dispatches: phase graphs + the fused-Pallas MSM commits.
Host work between graphs is only what the protocol forces there: the
Blake2b/Keccak transcript, the lookup permutation (sort/multiset), and
tiny Lagrange interpolations (SURVEY §3.2 hot path).

Graphs are keyed by a circuit tag (vk transcript digest + k), so
distinct circuits never share stale executables.
"""
from __future__ import annotations

import functools
import hashlib
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.constants import BN254_FR, BN254_FR_DELTA
from ..fields.limbs import FR_SPEC, L
from ..ops import modops as M
from ..ops import ntt as N
from ..ops import poly as P
from ..utils.aot_cache import aot_wrap
from . import cs as CS
from .domain import COSET_GEN, Domain

R = BN254_FR
SPEC = FR_SPEC


def _one_b(shape) -> jnp.ndarray:
    return jnp.broadcast_to(
        jnp.asarray(np.asarray(SPEC.one_mont).reshape(L, 1)), shape)


# ---------------------------------------------------------------------------
# generic (circuit-independent) graphs
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _to_mont_stack():
    # vmap over the batch axis: modops address limbs on axis 0
    return aot_wrap(f"to_mont_stack_{_GRAPH_REV}", jax.jit(
        jax.vmap(lambda x: M.to_mont(SPEC, x.astype(jnp.int32)))))


def to_mont_stack(x: jnp.ndarray) -> jnp.ndarray:
    """(B, L, n) standard limbs -> Montgomery form (one dispatch)."""
    return _to_mont_stack()(x)


@functools.lru_cache(maxsize=None)
def _to_mont_split_fn(na: int):
    def fn(x):
        m = jax.vmap(lambda c: M.to_mont(SPEC, c.astype(jnp.int32)))(x)
        return m[:na], m[na:]

    return aot_wrap(f"tmsplit{na}_{_GRAPH_REV}", jax.jit(fn))


def to_mont_split(x: jnp.ndarray, na: int):
    """(A+I, L, n) std limbs -> (advice (A,..), instance (I,..)) Montgomery
    stacks in one dispatch (no eager slicing)."""
    return _to_mont_split_fn(na)(x)


@functools.lru_cache(maxsize=None)
def _l2c_fn(k: int):
    return aot_wrap(f"l2c_k{k}_{_GRAPH_REV}", jax.jit(
        lambda s: jax.vmap(lambda a: N.intt(SPEC, a, k))(s)))


@functools.lru_cache(maxsize=None)
def _c2e_fn(k: int, ext_k: int):
    domain = Domain(k, ext_k)
    return aot_wrap(f"c2e_k{k}_{ext_k}_{_GRAPH_REV}", jax.jit(
        lambda s: jax.vmap(domain.coeff_to_extended)(s)))


_CONV_CHUNK = 6  # bounds the NTT working set (HBM) per dispatch


def _chunked(fn, stack: jnp.ndarray) -> jnp.ndarray:
    m = stack.shape[0]
    pad = (-m) % _CONV_CHUNK
    if pad:
        reps = -(-pad // m)
        filler = jnp.concatenate([stack] * reps, axis=0)[:pad]
        stack = jnp.concatenate([stack, filler], axis=0)
    outs = [fn(stack[i:i + _CONV_CHUNK])
            for i in range(0, stack.shape[0], _CONV_CHUNK)]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out[:m]


def _ntt_mesh(k: int):
    """Opt-in SP-sharded basis conversions (SURVEY §2.3 distributed NTT):
    WH2_SHARDED_NTT=1 + >=2 devices routes the prover's l2c/c2e NTTs
    through parallel.sharded's all_to_all transpose FFT on the mesh."""
    import os

    if os.environ.get("WH2_SHARDED_NTT", "0") != "1":
        return None
    import jax

    D = len(jax.devices())
    if D < 2 or (1 << k) % (D * D) != 0:
        return None
    from ..parallel.sharded import make_mesh

    return make_mesh()


def batched_l2c(k: int, stack: jnp.ndarray) -> jnp.ndarray:
    mesh = _ntt_mesh(k)
    if mesh is not None:
        from ..parallel.sharded import sharded_intt

        return jnp.stack([sharded_intt(mesh, stack[i], k)
                          for i in range(stack.shape[0])])
    return _chunked(_l2c_fn(k), stack)


def batched_c2e(k: int, ext_k: int, stack: jnp.ndarray) -> jnp.ndarray:
    mesh = _ntt_mesh(ext_k)
    if mesh is not None:
        from ..parallel.sharded import sharded_coeff_to_extended

        return jnp.stack([sharded_coeff_to_extended(mesh, stack[i], k, ext_k)
                          for i in range(stack.shape[0])])
    return _chunked(_c2e_fn(k, ext_k), stack)


@functools.lru_cache(maxsize=None)
def _powers_fn(n: int):
    return aot_wrap(f"powers_{n}_{_GRAPH_REV}", jax.jit(
        lambda w, g: M.montmul(SPEC, g, P.power_table(SPEC, w, n))))


def powers_of(w_mont: jnp.ndarray, scale_mont: jnp.ndarray,
              n: int) -> jnp.ndarray:
    """(L, n) Montgomery tensor of scale * w^i (device; one dispatch)."""
    return _powers_fn(n)(w_mont, scale_mont)


@functools.lru_cache(maxsize=8)
def coset_points(k: int) -> jnp.ndarray:
    """(L, n) Montgomery tensor of the coset g*w^i (shplonk/gwc domain)."""
    n = 1 << k
    w = N.root_of_unity(k)
    xs = []
    acc = COSET_GEN * SPEC.R % SPEC.p  # Montgomery form of the coset gen
    wm = w  # plain omega: acc stays in Montgomery form under plain-mod mul
    for _ in range(n):
        xs.append(acc)
        acc = acc * wm % SPEC.p
    from ..fields.limbs import ints_to_limbs_fast

    return jnp.asarray(ints_to_limbs_fast(xs), dtype=jnp.int32)


def _scan_z(num, den, carry, n: int, usable: int):
    """z[0] = carry; z[i+1] = z[i] * num[i]/den[i] on active rows."""
    den_inv = M.batch_inverse(SPEC, den, axis=1)
    ratio = M.montmul(SPEC, num, den_inv)
    mask = (jnp.arange(n) < usable)[None, :]
    ratio = jnp.where(mask, ratio, _one_b(ratio.shape))
    incl = M.prefix_mul(SPEC, ratio, 1)
    z = jnp.concatenate([_one_b((L, 1)), incl[:, :-1]], axis=1)
    return M.montmul(SPEC, carry, z)


# ---------------------------------------------------------------------------
# the per-circuit phase pipeline
# ---------------------------------------------------------------------------

_GLOBAL_FNS: dict = {}  # circuit tag -> {graph key -> wrapped callable}

# Cache-name revision for ALL phase graphs: the AOT disk cache keys on
# name+shapes, NOT code — bump this whenever in-graph kernel code changes
# (e.g. the NTT dispatch now routing to ops/ntt_pallas) so stale
# executables cannot load.
_GRAPH_REV = "r5a"


def _stable_key(obj) -> str:
    """Collision-safe, process-stable graph-cache key from a plan tuple.

    Python's hash() is salted per process (strings) and was truncated to
    24 bits here; a collision between two plans within one circuit tag
    would silently reuse the wrong compiled graph. 64-bit blake2b of the
    repr is deterministic across processes (it also keys the AOT disk
    cache) and collision-free for the handful of plans per circuit."""
    return hashlib.blake2b(repr(obj).encode(), digest_size=8).hexdigest()


class FusedPhases:
    """Lazily built, AOT-cached phase graphs for one ProvingKey."""

    def __init__(self, pk):
        self.pk = pk
        cs_ = pk.vk.cs
        self.cs = cs_
        self.domain: Domain = pk.vk.domain
        self.n = self.domain.n
        self.usable = cs_.usable_rows(self.n)
        self.tag = f"{pk.vk.transcript_repr & 0xFFFFFFFFFFFF:012x}" \
                   f"_k{self.domain.k}"
        self.na = cs_.num_advice
        self.ni = cs_.num_instance
        self.nz = cs_.num_perm_chunks()
        self.nlk = len(cs_.lookups)
        self.nf = cs_.num_fixed
        self.nsig = len(cs_.perm_columns)

        # unified multiopen source indexing (see prover.create_proof):
        # coeff_stack rows [advice | instance | perm_z | lookup{z,ap,sp,
        # in,tab}*nlk | random] ++ fixed ++ sigma ++ h_combined
        self.m_stack = self.na + self.ni + self.nz + 5 * self.nlk + 1
        self.u_fixed = self.m_stack
        self.u_sigma = self.m_stack + self.nf
        self.u_h = self.u_sigma + self.nsig
        self.u_total = self.u_h + 1
        # graph cache is GLOBAL, keyed by circuit tag: a fresh ProvingKey
        # for the same circuit reuses the already-traced jit objects (and
        # their in-process compiled executables)
        self._fns = _GLOBAL_FNS.setdefault(self.tag, {})

    def uidx(self, label) -> int:
        """query label -> row in the unified multiopen stack."""
        kind = label[0]
        if kind == CS.ADVICE:
            return label[1]
        if kind == CS.INSTANCE:
            return self.na + label[1]
        if kind == "perm_z":
            return self.na + self.ni + label[1]
        if kind in ("lookup_z", "lookup_ap", "lookup_sp"):
            off = {"lookup_z": 0, "lookup_ap": 1, "lookup_sp": 2}[kind]
            return self.na + self.ni + self.nz + 5 * label[1] + off
        if kind == "random":
            return self.na + self.ni + self.nz + 5 * self.nlk
        if kind == CS.FIXED:
            return self.u_fixed + label[1]
        if kind == "sigma":
            return self.u_sigma + label[1]
        if kind == "h":
            return self.u_h
        raise KeyError(label)

    def _get(self, key: str, builder):
        if key not in self._fns:
            self._fns[key] = aot_wrap(f"{key}_{_GRAPH_REV}_{self.tag}",
                                      jax.jit(builder()))
        return self._fns[key]

    # -- phase 2: lookup input/table compression ---------------------------
    def lookup_compress(self, fixed_stack, advice_stack, instance_stack,
                        theta_t):
        cs_ = self.cs

        def build():
            lookups = cs_.lookups

            def fn(fixed_s, advice_s, instance_s, th):
                def getter(kind, idx, rot):
                    src = {CS.FIXED: fixed_s, CS.ADVICE: advice_s,
                           CS.INSTANCE: instance_s}[kind][idx]
                    return jnp.roll(src, -rot, axis=1) if rot else src

                def compress(exprs):
                    acc = None
                    for e in exprs:
                        v = CS.eval_device(e, getter)
                        acc = v if acc is None else M.add(
                            SPEC, M.montmul(SPEC, acc, th), v)
                    return acc

                outs = []
                for lk in lookups:
                    outs.append(compress(lk.inputs))
                    outs.append(compress(lk.tables))
                mont = jnp.stack(outs)  # (2*nlk, L, n)
                std = jax.vmap(
                    lambda c: M.normalize(SPEC, M.from_mont(SPEC, c)))(mont)
                return mont, std

            return fn

        return self._get("lkcomp", build)(
            fixed_stack, advice_stack, instance_stack, theta_t)

    # -- phases 3-5: grand products + random poly --------------------------
    # one graph per permutation chunk / lookup + one assembly graph: a
    # single fused graph here was the largest compile in the pipeline and
    # choked both the remote compile service and XLA:CPU
    def _gp_chunk(self, ci: int):
        cs_ = self.cs
        usable = self.usable
        n = self.n
        chunk_len = cs_.permutation_chunk_len()
        perm_cols = cs_.perm_columns
        chunk = list(range(ci * chunk_len,
                           min((ci + 1) * chunk_len, len(perm_cols))))
        deltas = {j: pow(BN254_FR_DELTA, j, R) for j in chunk}

        def build():
            def fn(advice_s, fixed_s, instance_s, sigma_s, omega_m,
                   beta, gamma, carry):
                def col(kind, idx):
                    return {CS.FIXED: fixed_s, CS.ADVICE: advice_s,
                            CS.INSTANCE: instance_s}[kind][idx]

                num = den = None
                for j in chunk:
                    kind, idx = perm_cols[j]
                    v = col(kind, idx)
                    dj = jnp.asarray(SPEC.encode([deltas[j]]),
                                     dtype=jnp.int32)  # (L, 1) mont
                    idv = M.montmul(SPEC, dj, omega_m)
                    nt = M.add(SPEC, M.add(
                        SPEC, v, M.montmul(SPEC, beta, idv)), gamma)
                    dt = M.add(SPEC, M.add(
                        SPEC, v, M.montmul(SPEC, beta, sigma_s[j])), gamma)
                    num = nt if num is None else M.montmul(SPEC, num, nt)
                    den = dt if den is None else M.montmul(SPEC, den, dt)
                z = _scan_z(num, den, carry, n, usable)
                return z, z[:, usable:usable + 1]

            return fn

        return self._get(f"gpc{ci}", build)

    def _gp_lookup(self, li: int):
        n = self.n
        usable = self.usable

        def build():
            def fn(lkm, lkp, beta, gamma):
                num = M.montmul(SPEC, M.add(SPEC, lkm[2 * li], beta),
                                M.add(SPEC, lkm[2 * li + 1], gamma))
                den = M.montmul(SPEC, M.add(SPEC, lkp[2 * li], beta),
                                M.add(SPEC, lkp[2 * li + 1], gamma))
                return _scan_z(num, den, _one_b((L, 1)), n, usable)

            return fn

        return self._get(f"gplk{li}", build)

    def _gp_finish(self, nzs: int):
        usable = self.usable

        def build():
            def fn(zs, tails_std, rand_std):  # zs: tuple of (L, n)
                z_stack = jnp.stack(zs)
                tails = jax.vmap(lambda c: M.to_mont(
                    SPEC, c.astype(jnp.int32)))(tails_std)
                if tails.shape[-1]:
                    z_stack = z_stack.at[:, :, usable + 1:].set(tails)
                rnd = M.to_mont(SPEC, rand_std.astype(jnp.int32))
                return z_stack, rnd, jnp.concatenate(
                    [z_stack, rnd[None]], axis=0)

            return fn

        return self._get(f"gpf{nzs}", build)

    def grand_products(self, advice_stack, fixed_stack, instance_stack,
                       sigma_stack, omega_mont, beta_t, gamma_t,
                       lk_mont, lk_perm_mont, z_tails_std, random_std):
        """Everything between the (beta, gamma) squeeze and the y squeeze,
        except the commits: permutation z chunks (carry-chained across the
        per-chunk graphs), lookup z's, tail blinding, and the vanishing
        random polynomial. Returns (z_stack, random_lag, commit_stack)."""
        nz, nlk = self.nz, self.nlk
        zs = []
        carry = _one_b((L, 1))
        for ci in range(nz):
            z, carry = self._gp_chunk(ci)(
                advice_stack, fixed_stack, instance_stack, sigma_stack,
                omega_mont, beta_t, gamma_t, carry)
            zs.append(z)
        for li in range(nlk):
            zs.append(self._gp_lookup(li)(
                lk_mont, lk_perm_mont, beta_t, gamma_t))
        return self._gp_finish(nz + nlk)(tuple(zs), z_tails_std, random_std)

    # -- quotient input assembly: one dispatch, fixed row order -------------
    def lag_stack(self, advice_stack, instance_stack, z_stack,
                  lk_perm_mont, lk_mont, random_lag):
        """Rows: [advice | instance | perm z | per-lookup (z, a', s',
        compressed-in, compressed-tab) | random] — the offsets the
        quotient graph slices by."""
        nz, nlk = self.nz, self.nlk

        def build():
            def fn(adv, inst, zs, lkp, lkm, rnd):
                rows = [adv[i] for i in range(self.na)]
                rows += [inst[i] for i in range(self.ni)]
                rows += [zs[i] for i in range(nz)]
                for li in range(nlk):
                    rows += [zs[nz + li], lkp[2 * li], lkp[2 * li + 1],
                             lkm[2 * li], lkm[2 * li + 1]]
                rows.append(rnd)
                return jnp.stack(rows)

            return fn

        return self._get("lagstk", build)(
            advice_stack, instance_stack, z_stack, lk_perm_mont, lk_mont,
            random_lag)

    # -- phase 6: quotient --------------------------------------------------
    def quotient(self, ext_stack, beta_t, gamma_t, y_t):
        from .prover import _quotient_core

        cs_ = self.cs
        pk = self.pk
        ratio = self.domain.ext_n // self.n
        offsets = dict(adv=0, inst=self.na, z=self.na + self.ni,
                       lk=self.na + self.ni + self.nz)
        num_pieces = cs_.degree() - 1
        n = self.n
        # opt-in chunked evaluation (lax.map over circular ext windows):
        # per-constraint temps shrink chunks-fold and the int16 residents
        # are upcast per-window instead of full-width — the memory mode
        # that lets the 15-advice ES256 stack prove at k=17 on 16 GB
        nc = int(os.environ.get("WH2_QUOTIENT_CHUNKS", "1"))

        def build():
            core = _quotient_core(cs_, self.usable, ratio, offsets,
                                  self.na, self.ni, self.nz, self.nlk,
                                  chunks=nc)
            domain = self.domain

            def fn(fixed_ext, sigma_ext, ext_s, l0, llast, lblind, x_ext,
                   zh_inv, beta, gamma, y):
                if nc == 1:
                    # residents arrive int16 (lazy limbs < 2^12); upcast on
                    # read — XLA fuses the converts into the gate evaluation
                    i32 = jnp.int32
                    fixed_ext = [t.astype(i32) for t in fixed_ext]
                    sigma_ext = [t.astype(i32) for t in sigma_ext]
                    ext_s = ext_s.astype(i32)
                    l0, llast, lblind = (l0.astype(i32), llast.astype(i32),
                                         lblind.astype(i32))
                    x_ext = x_ext.astype(i32)
                    zh_inv = zh_inv.astype(i32)
                h_ext = core(fixed_ext, sigma_ext, ext_s, l0, llast,
                             lblind, x_ext, zh_inv, beta, gamma, y)
                h_coeff = domain.extended_to_coeff(h_ext)
                return jnp.stack([h_coeff[:, i * n:(i + 1) * n]
                                  for i in range(num_pieces)])

            return fn

        return self._get("quot" if nc == 1 else f"quotc{nc}", build)(
            pk.fixed_ext, pk.sigma_ext, ext_stack, pk.l0_ext, pk.llast_ext,
            pk.lblind_ext, pk.x_ext,
            jnp.asarray(self.domain.zh_inv_extended_np().astype(np.int16)),
            beta_t, gamma_t, y_t)

    # -- phase 7: evaluations ----------------------------------------------
    def evals(self, plan, rots, coeff_stack, fixed_coeff, sigma_coeff,
              h_pieces, pts_mont, xn_t):
        """plan: list of (unified_label, rot); rots: sorted distinct rots.
        Returns (evals_std (L, Q), h_combined (L, n), h_eval_std (L, 1))."""
        n = self.n
        plan_key = tuple((self.uidx(lbl), rot) for lbl, rot in plan)
        rots_key = tuple(rots)
        num_pieces = self.cs.degree() - 1

        def build():
            rot_pos = {r: i for i, r in enumerate(rots_key)}

            def fn(coeff_s, fixed_s, sigma_s, h_p, pts, xn):
                pows = [P.power_table(SPEC, pts[:, i:i + 1], n)
                        for i in range(len(rots_key))]
                # h_combined = Horner over pieces with x^n
                h_comb = h_p[num_pieces - 1]
                for i in range(num_pieces - 2, -1, -1):
                    h_comb = M.add(SPEC, M.montmul(SPEC, h_comb, xn),
                                   h_p[i])

                def poly_of(ui):
                    if ui < self.m_stack:
                        return coeff_s[ui]
                    if ui < self.u_sigma:
                        return fixed_s[ui - self.u_fixed]
                    if ui < self.u_h:
                        return sigma_s[ui - self.u_sigma]
                    return h_comb

                stacked = jnp.stack([poly_of(ui) for ui, _ in plan_key],
                                    axis=1)
                pw = jnp.stack([pows[rot_pos[r]] for _, r in plan_key],
                               axis=1)
                ev = P.mod_sum(SPEC, M.montmul(SPEC, stacked, pw))[..., 0]
                ev_std = M.normalize(SPEC, M.from_mont(SPEC, ev))
                h_ev = P.eval_at(SPEC, h_comb, pows[rot_pos[0]])
                h_ev_std = M.normalize(SPEC, M.from_mont(SPEC, h_ev))
                return ev_std, h_comb, h_ev_std

            return fn

        key = f"ev{_stable_key((plan_key, rots_key))}"
        return self._get(key, build)(
            coeff_stack, fixed_coeff, sigma_coeff, h_pieces, pts_mont, xn_t)

    # -- phase 8a: SHPLONK h — one small graph per set + one combiner -------
    # (same graph-size hygiene as GWC: per-set NTT pipelines stay small
    # enough for every XLA backend; per-(npts, nmembers) graphs are reused)
    def _shp_set(self, npts: int, members: tuple):
        n = self.n
        k = self.domain.k

        def build():
            def fn(uc, v, r_poly, pts_sel, xs_coset):
                # static-index gather: baked into the graph, no eager slice
                F = uc[members[0]]
                for ui in members[1:]:
                    F = M.add(SPEC, M.montmul(SPEC, F, v), uc[ui])
                r_pad = jnp.concatenate(
                    [r_poly, jnp.zeros((L, n - r_poly.shape[1]),
                                       dtype=jnp.int32)], axis=1)
                r_cos = N.ntt(SPEC, N.coset_shift(SPEC, r_pad, COSET_GEN), k)
                F_cos = N.ntt(SPEC, N.coset_shift(SPEC, F, COSET_GEN), k)
                num = M.sub(SPEC, F_cos, r_cos)
                zs = None
                for pi in range(npts):
                    term = M.sub(
                        SPEC, xs_coset,
                        jnp.broadcast_to(pts_sel[:, pi:pi + 1],
                                         xs_coset.shape))
                    zs = term if zs is None else M.montmul(SPEC, zs, term)
                num = M.montmul(SPEC, num, M.batch_inverse(SPEC, zs, axis=1))
                return F, num

            return fn

        key = _stable_key((npts, members))
        return self._get(f"shs{key}", build)

    def _shp_combine(self, S: int):
        k = self.domain.k

        def build():
            def fn(nums, y):  # nums: tuple of (L, n)
                h_total = nums[0]
                for i in range(1, S):
                    h_total = M.add(SPEC, M.montmul(SPEC, h_total, y),
                                    nums[i])
                ginv = pow(COSET_GEN, R - 2, R)
                return N.coset_shift(SPEC, N.intt(SPEC, h_total, k), ginv)

            return fn

        return self._get(f"shc{S}", build)

    def shplonk_h(self, set_struct, ucoeff, v_t, y_t, r_polys_list,
                  pts_list):
        """set_struct: tuple of (n_pts, (unified_idx...)) per set (sorted
        set order). r_polys_list / pts_list: per-set (L, n_pts) Montgomery
        device tensors (host-encoded — transfers, not compiles).
        Returns (h_coeff, F_list [(L, n)])."""
        k = self.domain.k
        F_list, nums = [], []
        for s_i, (npts, members) in enumerate(set_struct):
            F, num = self._shp_set(npts, members)(
                ucoeff, v_t, r_polys_list[s_i], pts_list[s_i],
                coset_points(k))
            F_list.append(F)
            nums.append(num)
        h_coeff = self._shp_combine(len(set_struct))(tuple(nums), y_t)
        return h_coeff, F_list

    # -- phase 8b: SHPLONK W ------------------------------------------------
    def shplonk_w(self, n_sets, F_list, h_coeff, y_t, scale_mont, ru_mont,
                  ztu_t, u_t):
        """F_list: tuple of (L, n); scale_mont/ru_mont: (L, S).
        Returns W_coeff (L, n)."""
        n = self.n
        k = self.domain.k

        def build():
            def fn(F_s, h_c, y, scale, ru, ztu, u, xs_coset):
                L_poly = None
                for s_i in range(n_sets):
                    sc = scale[:, s_i:s_i + 1]
                    term = M.montmul(SPEC, sc, F_s[s_i])
                    term = term.at[:, 0:1].set(M.sub(
                        SPEC, term[:, 0:1],
                        M.montmul(SPEC, sc, ru[:, s_i:s_i + 1])))
                    L_poly = term if L_poly is None else M.add(
                        SPEC, M.montmul(SPEC, L_poly, y), term)
                L_poly = M.sub(SPEC, L_poly, M.montmul(SPEC, ztu, h_c))
                L_cos = N.ntt(SPEC, N.coset_shift(SPEC, L_poly, COSET_GEN), k)
                den = M.sub(SPEC, xs_coset,
                            jnp.broadcast_to(u, xs_coset.shape))
                W_cos = M.montmul(SPEC, L_cos,
                                  M.batch_inverse(SPEC, den, axis=1))
                ginv = pow(COSET_GEN, R - 2, R)
                return N.coset_shift(SPEC, N.intt(SPEC, W_cos, k), ginv)

            return fn

        return self._get(f"shw{n_sets}", build)(
            tuple(F_list), h_coeff, y_t, scale_mont, ru_mont, ztu_t, u_t,
            coset_points(k))

    # -- phase 8 (GWC): one small graph per rotation-group size -------------
    # (a single graph holding every group's NTT pipeline is big enough to
    # crash/stall XLA compilers; per-size graphs are reused across groups)
    def _gwc_one(self, members: tuple):
        k = self.domain.k

        def build():
            def fn(uc, v, rcomb, zpt, xs_coset):
                F = uc[members[0]]
                for ui in members[1:]:
                    F = M.add(SPEC, M.montmul(SPEC, F, v), uc[ui])
                F = F.at[:, 0:1].set(M.sub(SPEC, F[:, 0:1], rcomb))
                F_cos = N.ntt(SPEC, N.coset_shift(SPEC, F, COSET_GEN), k)
                den = M.sub(SPEC, xs_coset,
                            jnp.broadcast_to(zpt, xs_coset.shape))
                W_cos = M.montmul(SPEC, F_cos,
                                  M.batch_inverse(SPEC, den, axis=1))
                ginv = pow(COSET_GEN, R - 2, R)
                return N.coset_shift(SPEC, N.intt(SPEC, W_cos, k), ginv)

            return fn

        key = _stable_key(members)
        return self._get(f"gwc1_{key}", build)

    def gwc_w(self, group_struct, ucoeff, v_t, rcomb_list, zpts_list):
        """group_struct: tuple of (unified_idx...) per rotation group (in
        first-occurrence order). rcomb_list/zpts_list: per-group (L, 1)
        device tensors. Returns list of W_coeff (L, n) per group."""
        k = self.domain.k
        outs = []
        for g_i, members in enumerate(group_struct):
            outs.append(self._gwc_one(members)(
                ucoeff, v_t, rcomb_list[g_i], zpts_list[g_i],
                coset_points(k)))
        return outs

    # -- unified multiopen stack -------------------------------------------
    def unified_stack(self, coeff_stack, fixed_coeff, sigma_coeff,
                      h_combined):
        def build():
            def fn(cstk, fstk, sstk, hc):
                parts = [cstk]
                if self.nf:
                    parts.append(fstk)
                if self.nsig:
                    parts.append(sstk)
                parts.append(hc[None])
                return jnp.concatenate(parts, axis=0)

            return fn

        return self._get("ustack", build)(
            coeff_stack, fixed_coeff, sigma_coeff, h_combined)
