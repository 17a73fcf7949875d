"""Key generation: vk/pk from a constraint system + fixed assignment.

The keygen_vk/keygen_pk equivalent (call stack SURVEY §3.1). Produces:
  * vk: fixed-column and permutation-sigma commitments + a transcript
    digest binding the whole circuit description;
  * pk: device-resident polynomial tensors in all three bases, the
    permutation sigma/identity tables, and the Lagrange-indicator
    polynomials (l_0, l_last, l_blind) on the extended coset.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..fields.constants import BN254_FR, BN254_FR_DELTA
from ..fields.limbs import FR_SPEC, ints_to_limbs_fast
from ..ops import ec as E
from ..ops import modops as M
from ..ops.msm import msm, msm_batch
from . import cs as CS
from .domain import Domain
from .srs import SRS
from .transcript import compress_g1

R = BN254_FR
DELTA = BN254_FR_DELTA


def encode_column(vals: list[int]) -> jnp.ndarray:
    """Host int column -> (L, n) device Montgomery tensor."""
    std = jnp.asarray(ints_to_limbs_fast([v % R for v in vals]))
    return M.to_mont(FR_SPEC, std)


def commit_lagrange(srs: SRS, col_mont: jnp.ndarray):
    """KZG commit of a Lagrange-basis column -> affine int point."""
    res = msm(E.BN254_CURVE, srs.g_lag, col_mont)
    return E.to_affine_ints(E.BN254_CURVE, res)[0]


def _pad8(cols: list) -> list:
    """Pad the batch size up to the next power of two (max 8): one compiled
    vmapped-MSM graph per bucket, without paying 8x work for a 2-column
    commit (the lookup/h batches are small)."""
    B = len(cols)
    target = 1
    while target < min(B, 8) or (B > 8 and target < -(-B // 8) * 8):
        target *= 2 if target < 8 else 1
        if target >= 8 and B > 8:
            target = -(-B // 8) * 8
            break
    return cols + [cols[0]] * (target - B)


def _maybe_pad(cols: list) -> list:
    """Power-of-two padding helps only the XLA vmap fallback share compiled
    graphs; the fused-Pallas engine runs MSMs one at a time (batch size is
    not a static shape), so padding there just costs extra dispatches."""
    from ..ops.msm import _use_fused

    return cols if _use_fused(cols[0].shape[1]) else _pad8(cols)


def _batch_input(cols):
    """list of (L, n) -> (B, L, n); a pre-stacked array passes through
    (the fused-prover path: stacks come straight out of phase graphs, so
    no per-row eager slices/stacks hit the device)."""
    if isinstance(cols, (list, tuple)):
        B = len(cols)
        if B == 0:
            return None, 0
        return jnp.stack(_maybe_pad(list(cols))), B
    return cols, cols.shape[0]


def _hostout_enabled(n: int) -> bool:
    """v3 MSM path: device graph ends at the window sums, Horner + affine
    conversion on host (saves the ~230 ms latency-bound device tail and
    the XLA boundary scan; ops/msm_pallas.msm_hostout)."""
    import os

    from ..ops.msm import _use_fused

    if os.environ.get("WH2_MSM_V3", "1") == "0":
        return False
    return _use_fused(n)


def _commit_mesh():
    """Opt-in TP-sharded commit phase (SURVEY §2.3): point axis of every
    commit MSM partitioned over the device mesh. WH2_SHARDED_COMMITS=1 +
    >=2 devices routes commit_lagrange_batch through
    parallel.sharded.sharded_msm — this is the 'one prover phase
    demonstrably sharded' path exercised by dryrun_multichip."""
    import os

    if os.environ.get("WH2_SHARDED_COMMITS", "0") != "1":
        return None
    import jax

    if len(jax.devices()) < 2:
        return None
    from ..parallel.sharded import make_mesh

    return make_mesh()


def commit_lagrange_batch(srs: SRS, cols) -> list:
    """Commit many Lagrange columns (list of rows OR (B, L, n) stack)."""
    stack, B = _batch_input(cols)
    if not B:
        return []
    mesh = _commit_mesh()
    if mesh is not None:
        from ..parallel.sharded import sharded_msm

        out = []
        for i in range(B):
            res = sharded_msm(mesh, srs.g_lag, stack[i])
            out.append(E.to_affine_ints(E.BN254_CURVE, res)[0])
        return out
    if _hostout_enabled(stack.shape[2]):
        from ..ops.msm_pallas import msm_hostout

        return msm_hostout(E.BN254_CURVE, srs.g_lag, stack)[:B]
    res = msm_batch(E.BN254_CURVE, srs.g_lag, stack)
    return E.to_affine_ints(E.BN254_CURVE, res)[:B]


def commit_coeff_batch(srs: SRS, cols) -> list:
    stack, B = _batch_input(cols)
    if not B:
        return []
    if _hostout_enabled(stack.shape[2]):
        from ..ops.msm_pallas import msm_hostout

        return msm_hostout(E.BN254_CURVE, srs.g_mono, stack)[:B]
    res = msm_batch(E.BN254_CURVE, srs.g_mono, stack)
    return E.to_affine_ints(E.BN254_CURVE, res)[:B]


def commit_coeff(srs: SRS, coeffs_mont: jnp.ndarray):
    if _hostout_enabled(coeffs_mont.shape[1]):
        from ..ops.msm_pallas import msm_hostout

        return msm_hostout(E.BN254_CURVE, srs.g_mono, coeffs_mont[None])[0]
    res = msm(E.BN254_CURVE, srs.g_mono, coeffs_mont)
    return E.to_affine_ints(E.BN254_CURVE, res)[0]


@dataclass
class VerifyingKey:
    domain: Domain
    cs: CS.ConstraintSystem
    fixed_commitments: list
    perm_commitments: list
    transcript_repr: int
    # host copies needed by the verifier
    fixed_values: None = None  # verifier recomputes nothing; evals come in proof

    def hash_into(self, transcript) -> None:
        transcript.common_scalar(self.transcript_repr)


@dataclass
class ProvingKey:
    vk: VerifyingKey
    srs: SRS
    # (num_fixed, L, n) stacks
    fixed_lagrange: list
    fixed_coeff: list
    fixed_ext: list
    # permutation data (one entry per perm column)
    sigma_values: list  # host ints (n,) per column: sigma label values
    sigma_lagrange: list
    sigma_coeff: list
    sigma_ext: list
    id_values: list  # host ints (n,): delta^j * omega^i labels
    # indicator polys on extended coset
    l0_ext: jnp.ndarray
    llast_ext: jnp.ndarray
    lblind_ext: jnp.ndarray
    # coset point tensor X on extended domain, and omega powers on H
    x_ext: jnp.ndarray
    omega_pows_np: np.ndarray  # (n,) host ints


def _domain_for(cs: CS.ConstraintSystem, k: int) -> Domain:
    d = cs.degree()
    ext = 0
    while (1 << ext) < d - 1:
        ext += 1
    return Domain(k, k + ext)


def assemble_permutation(cs: CS.ConstraintSystem, n: int, copies: list):
    """Cycle-build sigma: start from identity, swap targets per copy pair.

    copies: [((kind, index, row), (kind, index, row)), ...] where each
    (kind,index) must be in cs.perm_columns.
    Returns sigma as (num_cols, n) array of (col, row) targets.
    """
    col_pos = {c: i for i, c in enumerate(cs.perm_columns)}
    ncols = len(cs.perm_columns)
    mapping = np.empty((ncols, n, 2), dtype=np.int64)
    for j in range(ncols):
        mapping[j, :, 0] = j
        mapping[j, :, 1] = np.arange(n)
    for (ka, ia, ra), (kb, ib, rb) in copies:
        a = (col_pos[(ka, ia)], ra)
        b = (col_pos[(kb, ib)], rb)
        tmp = mapping[a[0], a[1]].copy()
        mapping[a[0], a[1]] = mapping[b[0], b[1]]
        mapping[b[0], b[1]] = tmp
    return mapping


def keygen(srs: SRS, cs: CS.ConstraintSystem, fixed_cols: list, copies: list
           ) -> ProvingKey:
    import os as _os
    import sys as _sys
    import time as _t

    def _span(name, t0):
        if _os.environ.get("WH2_TRACE"):
            jnp.zeros(1).block_until_ready()
            print(f"[keygen] {name}: {_t.time()-t0:.2f}s",
                  file=_sys.stderr, flush=True)
        return _t.time()

    _tt = _t.time()
    k = srs.k
    n = 1 << k
    domain = _domain_for(cs, k)
    assert len(fixed_cols) == cs.num_fixed

    # --- fixed columns (batched conversions through the SAME AOT graphs
    # the prover uses — no extra compiles on the tunneled backend) ---
    from .fused import batched_c2e, batched_l2c, to_mont_stack

    def _pack(cols: list) -> jnp.ndarray:
        flat: list[int] = []
        for col in cols:
            flat.extend(int(v) % BN254_FR for v in col)
            flat.extend([0] * (n - len(col)))
        arr = np.asarray(ints_to_limbs_fast(flat), dtype=np.int32)
        return jnp.asarray(np.ascontiguousarray(
            arr.reshape(arr.shape[0], len(cols), n).transpose(1, 0, 2)))

    fixed_lagrange, fixed_coeff, fixed_ext = [], [], []
    if fixed_cols:
        lag_stack = to_mont_stack(_pack(fixed_cols))
        coeff_stack = batched_l2c(k, lag_stack)
        ext_stack = batched_c2e(k, domain.extended_k, coeff_stack)
        fixed_lagrange = [lag_stack[i] for i in range(len(fixed_cols))]
        fixed_coeff = [coeff_stack[i] for i in range(len(fixed_cols))]
        fixed_ext = [ext_stack[i].astype(jnp.int16)
                     for i in range(len(fixed_cols))]
    _tt = _span("fixed cols", _tt)
    fixed_comms = commit_lagrange_batch(srs, fixed_lagrange)
    _tt = _span("fixed commits", _tt)

    # --- permutation sigmas (labels computed on-device) ---
    from .fused import powers_of

    omega = domain.omega
    one_m = jnp.asarray(FR_SPEC.encode([1]), dtype=jnp.int32)
    omega_mont = powers_of(
        jnp.asarray(FR_SPEC.encode([omega]), dtype=jnp.int32), one_m, n)
    omega_ints = FR_SPEC.decode(np.asarray(omega_mont))
    omega_pows = np.empty(n, dtype=object)
    omega_pows[:] = omega_ints
    ncols = len(cs.perm_columns)
    deltas = [pow(DELTA, j, R) for j in range(ncols)]

    _tt = _span("omega pows", _tt)
    mapping = assemble_permutation(cs, n, copies)
    _tt = _span("assemble perm", _tt)
    sigma_values: list = []  # host copies materialized lazily if ever needed
    id_values: list = []
    sigma_lagrange, sigma_coeff, sigma_ext = [], [], []
    if ncols:
        # omega_mont already device-resident Montgomery from powers_of
        delta_mont = jnp.asarray(
            np.concatenate(
                [ints_to_limbs_fast([d]) for d in deltas], axis=1
            )
        )
        delta_mont = M.to_mont(FR_SPEC, delta_mont)  # (L, ncols)
        tgt_col = jnp.asarray(mapping[:, :, 0].astype(np.int32))  # (ncols, n)
        tgt_row = jnp.asarray(mapping[:, :, 1].astype(np.int32))
        # sigma_j[i] = delta^(tc) * omega^(tr): one batched montmul
        d_g = delta_mont[:, tgt_col]  # (L, ncols, n)
        w_g = omega_mont[:, tgt_row]
        sig_stack = M.montmul(FR_SPEC, d_g, w_g)  # (L, ncols, n) mont
        sig_stack = jnp.moveaxis(sig_stack, 1, 0)  # (ncols, L, n)
        sig_coeff_stack = batched_l2c(k, sig_stack)
        sig_ext_stack = batched_c2e(k, domain.extended_k, sig_coeff_stack)
        sigma_lagrange = [sig_stack[j] for j in range(ncols)]
        sigma_coeff = [sig_coeff_stack[j] for j in range(ncols)]
        sigma_ext = [sig_ext_stack[j].astype(jnp.int16) for j in range(ncols)]
    _tt = _span("sigma polys", _tt)
    perm_comms = commit_lagrange_batch(srs, sigma_lagrange) if sigma_lagrange else []
    _tt = _span("sigma commits", _tt)

    # --- indicator polynomials ---
    # row layout: data rows [0, usable); boundary row `usable` (the grand
    # products' final value); blinding rows (usable, n).
    u = cs.usable_rows(n)
    l0 = [0] * n
    l0[0] = 1
    llast = [0] * n
    llast[u] = 1
    lblind = [0] * n
    for i in range(u + 1, n):
        lblind[i] = 1
    # int16 residency for all extended-domain tensors (limbs < 2^12;
    # the quotient graph upcasts on read)
    l0_ext = domain.coeff_to_extended(
        domain.lagrange_to_coeff(encode_column(l0))).astype(jnp.int16)
    llast_ext = domain.coeff_to_extended(
        domain.lagrange_to_coeff(encode_column(llast))
    ).astype(jnp.int16)
    lblind_ext = domain.coeff_to_extended(
        domain.lagrange_to_coeff(encode_column(lblind))
    ).astype(jnp.int16)
    _tt = _span("indicator polys", _tt)

    # --- coset points X on extended domain ---
    from .domain import COSET_GEN

    ext_n = domain.ext_n
    wext = domain.omega_ext
    xs = [0] * ext_n
    accx = COSET_GEN
    for i in range(ext_n):
        xs[i] = accx
        accx = accx * wext % R
    x_ext = encode_column(xs).astype(jnp.int16)
    _tt = _span("x_ext coset", _tt)

    # --- vk digest ---
    h = hashlib.blake2b(digest_size=64, person=b"WH2-TPU-vk")
    h.update(k.to_bytes(4, "little"))
    h.update(domain.extended_k.to_bytes(4, "little"))
    h.update(repr(
        (cs.num_fixed, cs.num_advice, cs.num_instance,
         [(nm, str(g)) for nm, g in cs.gates],
         [(lk.name, [str(e) for e in lk.inputs], [str(e) for e in lk.tables])
          for lk in cs.lookups],
         cs.perm_columns)
    ).encode())
    for c in fixed_comms + perm_comms:
        h.update(compress_g1(c))
    repr_int = int.from_bytes(h.digest(), "little") % R

    vk = VerifyingKey(domain, cs, fixed_comms, perm_comms, repr_int)
    return ProvingKey(
        vk, srs, fixed_lagrange, fixed_coeff, fixed_ext,
        sigma_values, sigma_lagrange, sigma_coeff, sigma_ext, id_values,
        l0_ext, llast_ext, lblind_ext, x_ext, omega_pows,
    )
