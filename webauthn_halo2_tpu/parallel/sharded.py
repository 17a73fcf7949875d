"""Multi-chip sharding: distributed MSM, distributed NTT, batch proving.

The reference has NO distributed execution (SURVEY §2.3); these are the
first-class new components of the TPU build:
  * sharded_msm — points/scalars partitioned over the mesh axis; each
    shard runs the full Pippenger pipeline on its slice, partials combined
    with a log tree of complete adds (the "psum" for a non-abelian sum).
  * sharded_ntt — Cooley-Tukey split n = D * n2: short DFT across devices
    (all_gather over ICI), local twiddles, local long NTTs. Bit-identical
    to the single-chip NTT.
  * batch_commit — DP axis: one signature's column per shard (BASELINE
    config 5: batched multi-signature proving).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..fields.limbs import FR_SPEC, L
from ..ops import ec as E
from ..ops import modops as M
from ..ops import msm as MSM
from ..ops import ntt as N
from ..ops.ec import JPoint


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devs), (axis,))


def _tree_reduce_complete(pts: JPoint) -> JPoint:
    n = pts.x.shape[1]
    while n > 1:
        half = n // 2
        lo = JPoint(pts.x[:, :half], pts.y[:, :half], pts.z[:, :half])
        hi = JPoint(
            pts.x[:, half : 2 * half],
            pts.y[:, half : 2 * half],
            pts.z[:, half : 2 * half],
        )
        s = E.add(E.BN254_CURVE, lo, hi)
        if n % 2:
            s = JPoint(
                jnp.concatenate([s.x, pts.x[:, -1:]], 1),
                jnp.concatenate([s.y, pts.y[:, -1:]], 1),
                jnp.concatenate([s.z, pts.z[:, -1:]], 1),
            )
            n = half + 1
        else:
            n = half
        pts = s
    return pts


# ---------------------------------------------------------------------------
# distributed MSM
# ---------------------------------------------------------------------------

def sharded_msm(mesh: Mesh, points: JPoint, scalars_mont: jnp.ndarray,
                c: int | None = None) -> JPoint:
    """MSM with the point axis sharded over the mesh (exact result)."""
    axis = mesh.axis_names[0]

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(None, axis), P(None, axis), P(None, axis), P(None, axis)),
        out_specs=(P(None, axis), P(None, axis), P(None, axis)),
    )
    def local_msm(px, py, pz, sc):
        res = MSM.msm(E.BN254_CURVE, JPoint(px, py, pz), sc, c)
        return res.x, res.y, res.z

    rx, ry, rz = local_msm(points.x, points.y, points.z, scalars_mont)
    return _tree_reduce_complete(JPoint(rx, ry, rz))


# ---------------------------------------------------------------------------
# distributed NTT
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _ntt_shard_consts(k: int, D: int, inverse: bool = False):
    """(dft matrix (L,D,D), twiddle table (L,D,n2)) as numpy int32.

    For the inverse transform the root is w^-1 and the cross-twiddle
    table carries the D^-1 factor (the local length-n2 inverse core
    supplies the remaining n2^-1, so the product is the full n^-1)."""
    n = 1 << k
    n2 = n // D
    p = FR_SPEC.p
    w = N.root_of_unity(k)
    if inverse:
        w = pow(w, p - 2, p)
    wD = pow(w, n2, p)  # order D root: omega_{n1}
    dft = [pow(wD, (i * j) % D, p) for j in range(D) for i in range(D)]
    dft_t = np.asarray(FR_SPEC.encode(dft)).reshape(L, D, D)  # [:, j1, i1]
    scale = pow(D, p - 2, p) if inverse else 1
    tw = []
    for j1 in range(D):
        base = pow(w, j1, p)
        acc = scale
        for i2 in range(n2):
            tw.append(acc)
            acc = acc * base % p
    tw_t = np.asarray(FR_SPEC.encode(tw)).reshape(L, D, n2)  # [:, j1, i2]
    return dft_t, tw_t


def sharded_ntt(mesh: Mesh, a: jnp.ndarray, k: int,
                inverse: bool = False) -> jnp.ndarray:
    """Forward NTT of size 2^k, polynomial axis sharded over the mesh —
    constant per-device memory via the all_to_all transpose (SURVEY §2.3,
    the "sequence-parallel" analog: the polynomial axis is the long axis).

    Split a[i] with i = i1*n2 + i2 (rows i1 on devices); output index
    j = j1 + D*j2. Four steps, classic transpose-based distributed FFT:

      1. all_to_all #1: re-partition from i1-sharded to i2-block-sharded
         — device c then holds a[i1, i2] for ALL i1 and its n2/D slice
         of i2 (per-device footprint stays (L, n2): no replication,
         unlike the round-3 all_gather design which held D*n2 rows).
      2. local D-point DFT across the now-local i1 axis:
             inner[j1, i2] = sum_i1 omega_D^(i1 j1) a[i1, i2]
         + the cross twiddle omega^(i2 j1) (i2 global: the device's block
         offset is static per shard via axis_index).
      3. all_to_all #2: re-partition from i2-blocks back to j1-sharded.
      4. local length-n2 NTT over i2 -> X[j1 + D*j2] on device j1.

    Bit-identical to the single-chip N.ntt (asserted in
    tests/test_sharding.py).
    """
    axis = mesh.axis_names[0]
    D = int(mesh.devices.size)
    n = 1 << k
    assert n % (D * D) == 0 and (D & (D - 1)) == 0
    n2 = n // D
    n2d = n2 // D
    k2 = n2.bit_length() - 1
    dft_np, tw_np = _ntt_shard_consts(k, D, inverse)
    dft_t = jnp.asarray(dft_np)          # (L, j1, i1)
    # twiddle table re-chunked by i2 blocks: (L, j1, c, n2d) -> shard on c
    tw_t = jnp.asarray(tw_np).reshape(L, D, D, n2d)

    rows = a.reshape(L, D, n2)

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(None, axis, None), P(None, None, axis, None),
                  P(None, None, None)),
        out_specs=P(None, axis, None),
    )
    def stage(row_blk, tw_blk, dft_full):
        # row_blk: (L, 1, n2) — this device's i1 row
        # 1) split the local i2 range into D chunks and transpose
        t = row_blk.reshape(L, D, n2d)           # axis 1: i2-chunk c
        recv = jax.lax.all_to_all(
            t, axis, split_axis=1, concat_axis=1, tiled=True
        )                                        # (L, D, n2d): axis 1 = i1
        # 2) short DFT over i1 (now local) for every j1, + cross twiddle
        outs = []
        for j1 in range(D):
            acc = None
            for i1 in range(D):
                coef = dft_full[:, j1:j1 + 1, i1]     # (L, 1)
                term = M.montmul(FR_SPEC, recv[:, i1], coef)
                acc = term if acc is None else M.add(FR_SPEC, acc, term)
            # tw_blk: (L, j1, 1, n2d) — this device's i2 block of the
            # omega^(i2 j1) table
            outs.append(M.montmul(FR_SPEC, acc, tw_blk[:, j1, 0]))
        y = jnp.stack(outs, axis=1)              # (L, D(j1), n2d)
        # 3) transpose back: j1 -> devices, i2 blocks -> local axis
        back = jax.lax.all_to_all(
            y, axis, split_axis=1, concat_axis=2, tiled=True
        )                                        # (L, 1, D*n2d = n2)
        # 4) local long NTT over the full i2 range
        z = N._ntt_core(FR_SPEC, back[:, 0], k2, inverse, FR_SPEC.p,
                        N._base_root(FR_SPEC))
        return z[:, None, :]

    out = stage(rows, tw_t, dft_t)  # (L, D, n2): [j1, j2] = X[j1 + D*j2]
    return out.transpose(0, 2, 1).reshape(L, n)


def sharded_intt(mesh: Mesh, a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inverse NTT, polynomial axis sharded (same transpose FFT with the
    inverse root; the n^-1 factor is split D^-1 * n2^-1 across stages).
    Bit-identical to the single-chip N.intt."""
    return sharded_ntt(mesh, a, k, inverse=True)


def sharded_coeff_to_extended(mesh: Mesh, a: jnp.ndarray, k: int,
                              ext_k: int) -> jnp.ndarray:
    """Domain.coeff_to_extended with the big forward NTT on the mesh:
    zero-pad to ext_n, coset-shift (elementwise), distributed NTT."""
    from ..fields.constants import BN254_FR_GENERATOR

    ext_n = 1 << ext_k
    pad = jnp.zeros((L, ext_n - a.shape[1]), dtype=jnp.int32)
    a = jnp.concatenate([a, pad], axis=1)
    shifted = N.coset_shift(FR_SPEC, a, BN254_FR_GENERATOR)
    return sharded_ntt(mesh, shifted, ext_k)


# ---------------------------------------------------------------------------
# batch (DP) commitments
# ---------------------------------------------------------------------------

def batch_commit(mesh: Mesh, g_lag: JPoint, columns_mont: jnp.ndarray
                 ) -> JPoint:
    """Commit B columns (B sharded over the mesh): the DP axis of batched
    multi-signature proving. columns_mont: (B, L, n); returns (L, B) points.
    """
    axis = mesh.axis_names[0]

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(axis, None, None), P(None, None, None)),
        out_specs=(P(None, axis), P(None, axis), P(None, axis)),
    )
    def local(cols, g):
        pts = JPoint(g[0], g[1], g[2])
        outs_x, outs_y, outs_z = [], [], []
        for b in range(cols.shape[0]):
            r = MSM.msm(E.BN254_CURVE, pts, cols[b])
            outs_x.append(r.x)
            outs_y.append(r.y)
            outs_z.append(r.z)
        return (
            jnp.concatenate(outs_x, 1),
            jnp.concatenate(outs_y, 1),
            jnp.concatenate(outs_z, 1),
        )

    g_stack = jnp.stack([g_lag.x, g_lag.y, g_lag.z])
    rx, ry, rz = local(columns_mont, g_stack)
    return JPoint(rx, ry, rz)
