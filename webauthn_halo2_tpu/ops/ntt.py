"""Radix-2 NTT over bn254-Fr limb tensors (the prover's FFT engine).

Replaces the `halo2_proofs` best_fft the reference relies on for quotient
construction (SURVEY §2.2, call stack §3.2). Conventions follow the PSE
halo2 domain: forward NTT maps coefficients -> evaluations on the subgroup
H = <omega> of size n = 2^k in natural order; inverse divides by n.

Layout: polynomials are (L, n) int32 limb tensors (Montgomery form).
The butterfly schedule is decimation-in-time with a bit-reversal
pre-permutation (precomputed constant gather), each stage fully
vectorized across the n axis; per-stage twiddles are constant tensors.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.constants import BN254_FR, BN254_FR_ROOT_OF_UNITY, BN254_FR_S
from ..fields.limbs import FR_SPEC, FieldSpec, L, ints_to_limbs
from . import modops as M


def root_of_unity(k: int, p: int = BN254_FR, base: int = BN254_FR_ROOT_OF_UNITY,
                  s: int = BN254_FR_S) -> int:
    """Primitive 2^k-th root of unity in Fr (halo2 convention: squares of
    the 2^S root)."""
    assert k <= s
    w = base
    for _ in range(s - k):
        w = w * w % p
    return w


@functools.lru_cache(maxsize=None)
def _bitrev_perm(k: int) -> np.ndarray:
    n = 1 << k
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    # int32 indices: halves the gather-constant footprint in every
    # phase graph shipped to the compile relay (k=18+ hit its body cap)
    return rev.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _stage_twiddles(k: int, inverse: bool, p: int, base_root: int):
    """Per-stage twiddle limb tensors (Montgomery form), stage m = 1..k.

    Stage with half-block size h uses twiddles w_n^(j * n/(2h)), j in [0,h),
    where w_n is the 2^n-th root (or its inverse).
    """
    spec = FR_SPEC
    n = 1 << k
    w = root_of_unity(k, p=p, base=base_root)
    if inverse:
        w = pow(w, p - 2, p)
    out = []
    for stage in range(1, k + 1):
        h = 1 << (stage - 1)  # half-block
        step = n >> stage
        tw = [pow(w, j * step, p) for j in range(h)]
        # canonical Montgomery limbs are bytes: stored uint8 (4x smaller
        # graph constants), upcast to int32 in-graph at the use site
        out.append(np.asarray(spec.encode(tw), dtype=np.uint8))  # (L, h)
    return out


def _ntt_core(spec: FieldSpec, a: jnp.ndarray, k: int, inverse: bool,
              p: int, base_root: int) -> jnp.ndarray:
    n = 1 << k
    assert a.shape == (L, n)
    perm = jnp.asarray(_bitrev_perm(k))
    x = a[:, perm]
    twiddles = _stage_twiddles(k, inverse, p, base_root)
    for stage in range(1, k + 1):
        h = 1 << (stage - 1)
        tw = jnp.asarray(twiddles[stage - 1]).astype(jnp.int32)  # (L, h)
        xr = x.reshape(L, n >> stage, 2, h)
        lo = xr[:, :, 0, :]  # (L, blocks, h)
        hi = xr[:, :, 1, :]
        whi = M.montmul(spec, tw[:, None, :], hi)
        x = jnp.concatenate(
            [M.add(spec, lo, whi)[:, :, None, :],
             M.sub(spec, lo, whi)[:, :, None, :]], axis=2
        ).reshape(L, n)
    if inverse:
        n_inv = pow(n, p - 2, p)
        ninv_l = jnp.asarray(
            ints_to_limbs([n_inv * spec.R % p]), dtype=jnp.int32
        )  # mont form
        x = M.montmul(spec, ninv_l, x)
    return x


def _use_fused_ntt(k: int) -> bool:
    """Route to the fused-Pallas NTT (ops/ntt_pallas.py) on TPU: the XLA
    stage loop materializes every butterfly stage to HBM; the fused
    kernels keep log2(8192) stages VMEM-resident per pass."""
    import os

    mode = os.environ.get("WH2_NTT_IMPL", "auto")
    if mode == "xla":
        return False
    if k < 14:
        return False
    return mode == "pallas" or jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnums=(0, 2))
def ntt(spec: FieldSpec, a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Forward NTT: coefficients -> evaluations on H (natural order)."""
    if _use_fused_ntt(k):
        from .ntt_pallas import ntt_fused

        return ntt_fused(spec, a, k, False)
    return _ntt_core(spec, a, k, False, spec.p, _base_root(spec))


@functools.partial(jax.jit, static_argnums=(0, 2))
def intt(spec: FieldSpec, a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inverse NTT: evaluations -> coefficients."""
    if _use_fused_ntt(k):
        from .ntt_pallas import ntt_fused

        return ntt_fused(spec, a, k, True)
    return _ntt_core(spec, a, k, True, spec.p, _base_root(spec))


def _base_root(spec: FieldSpec) -> int:
    assert spec.p == BN254_FR, "NTT domain only defined over bn254 Fr"
    return BN254_FR_ROOT_OF_UNITY


@functools.lru_cache(maxsize=None)
def _power_table(spec: FieldSpec, g: int, n: int) -> np.ndarray:
    """(L, n) Montgomery limb tensor of [g^0, g^1, ..., g^(n-1)]."""
    powers = []
    acc = 1
    for _ in range(n):
        powers.append(acc)
        acc = acc * g % spec.p
    return np.asarray(spec.encode(powers), dtype=np.uint8)


def coset_shift(spec: FieldSpec, a: jnp.ndarray, g: int) -> jnp.ndarray:
    """Scale coefficient i by g^i (evaluate-on-coset preparation).

    Used for the extended-domain quotient evaluation (the halo2
    coeff_to_extended equivalent)."""
    pw = jnp.asarray(_power_table(spec, g, a.shape[1])).astype(jnp.int32)
    return M.montmul(spec, a, pw)
