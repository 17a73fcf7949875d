"""Fused Pallas NTT over bn254-Fr (the quotient phase's FFT engine).

The XLA stage loop in ops/ntt.py materializes every butterfly stage to
HBM (montmul + add/sub + concat per stage ≈ 100+ MB of traffic × k
stages × ~100 NTT-equivalents per proof — the 10.4 s quotient phase).
Here a radix-2 DIT NTT runs as:

  * one bitrev gather (XLA, unchanged conventions from ops/ntt.py);
  * kernel A: ALL block-local stages (pair distance h < T) fused in one
    pass — a (L, T)-lane block stays VMEM-resident through log2(T)
    butterfly stages; twiddle patterns are built in-register from the
    compact (L, h) tables by broadcast+reshape; the lane-roll butterfly
    does one montmul + two rolls + one select per stage;
  * kernel B (once per remaining stage, h >= T): grid over OUTPUT
    blocks; BlockSpec index maps fetch the lo/hi partner blocks and the
    (b mod h/T)-th twiddle slice, so each stage is one read-2/write-1
    pass with no XLA glue.

Bit-exact with ops/ntt.ntt/intt (same _stage_twiddles, same bitrev
order) — asserted in tests/test_ntt_pallas.py and on TPU by
scripts/profile_ntt.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limbs import FR_SPEC, L, FieldSpec, ints_to_limbs
from . import modops as M
from .msm_pallas import _lazy_reduce_body, _sub_body
from .ntt import _base_root, _bitrev_perm, _stage_twiddles, root_of_unity
from .pallas_kernels import _montmul_body

T_LANES = 8192  # lanes per kernel-A block (stages h < T are block-local)


@functools.lru_cache(maxsize=None)
def _tiled_patterns(k: int, inverse: bool, spec: FieldSpec, T: int):
    """(n_stages, L, T) per-stage twiddle patterns, pattern[s][i] =
    tw_s[i mod 2^s] (host-precomputed; see _kernel_a docstring)."""
    n_stages = T.bit_length() - 1
    tws = _stage_twiddles(k, inverse, spec.p, _base_root(spec))
    return np.stack([
        np.tile(tws[s], (1, T >> s)) for s in range(n_stages)
    ])


def _add_body(a, b, c256):
    return _lazy_reduce_body(a + b, c256)


def _kernel_a(spec, T, n_stages, x_ref, tw_ref, p_ref, pad_ref, c256_ref,
              o_ref):
    """All block-local DIT stages. tw_ref: (n_stages, L, T) PRE-TILED
    twiddle patterns — pattern[s][i] = tw_s[i mod 2^s]; building the
    pattern in-kernel needs a (L, T//h, h)->(L, T) reshape Mosaic cannot
    lower (infer-vector-layout: unsupported shape cast)."""
    p_col = p_ref[:, :]
    pad = pad_ref[:, :]
    c256 = c256_ref[:, :]
    x = x_ref[0]                      # (L, T)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    for s in range(n_stages):
        h = 1 << s
        pat = tw_ref[s]               # (L, T)
        t = _montmul_body(spec, pat, x, p_col)
        lo_partner = pltpu.roll(t, T - h, 1)   # element i gets t[i+h]
        hi_partner = pltpu.roll(x, h, 1)       # element i gets x[i-h]
        is_lo = (lane & h) == 0
        out_lo = _add_body(x, lo_partner, c256)
        out_hi = _sub_body(hi_partner, t, pad, c256)
        x = jnp.where(is_lo, out_lo, out_hi)
    o_ref[0] = x


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _stage_a(spec: FieldSpec, x, k: int, inverse: bool, t_lanes: int = 0):
    """x: (B, L, n) bitrev-ordered; runs stages 1..log2(min(T, n))."""
    B, _, n = x.shape
    T = min(t_lanes or T_LANES, n)
    n_stages = T.bit_length() - 1
    tw_cat = _tiled_patterns(k, inverse, spec, T)
    consts = [
        jnp.asarray(np.asarray(v).reshape(L, 1), jnp.int32)
        for v in (spec.p_limbs, spec.sub_pad, spec.c256_limbs)
    ]
    nb = n // T
    # blocks come straight off the lane axis via index maps — reshaping
    # (B, L, n) would interleave the limb axis with the block axis
    blk = pl.BlockSpec((1, L, T), lambda g, i: (g, 0, i),
                       memory_space=pltpu.VMEM)
    blk_tw = pl.BlockSpec((n_stages, L, T), lambda g, i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    blk_c = pl.BlockSpec((L, 1), lambda g, i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_a, spec, T, n_stages),
        out_shape=jax.ShapeDtypeStruct((B, L, n), jnp.int32),
        grid=(B, nb),
        in_specs=[blk, blk_tw] + [blk_c] * 3,
        out_specs=blk,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x, jnp.asarray(tw_cat).astype(jnp.int32), *consts)


def _kernel_b(spec, is_hi_bit, x_lo_ref, x_hi_ref, tw_ref,
              p_ref, pad_ref, c256_ref, o_ref):
    """One cross-block stage: output block = lo+w*hi or lo-w*hi depending
    on whether this block index has the stage bit set."""
    p_col = p_ref[:, :]
    pad = pad_ref[:, :]
    c256 = c256_ref[:, :]
    b = pl.program_id(1)
    lo = x_lo_ref[0]
    hi = x_hi_ref[0]
    t = _montmul_body(spec, tw_ref[0], hi, p_col)
    is_hi = (b & is_hi_bit) != 0
    out_lo = _add_body(lo, t, c256)
    out_hi = _sub_body(lo, t, pad, c256)
    o_ref[0] = jnp.where(is_hi, out_hi, out_lo)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def _stage_b(spec: FieldSpec, x, k: int, stage_h: int, inverse: bool,
             t_lanes: int = 0):
    """x: (B, L, n); one DIT stage with pair distance h >= T."""
    B, _, n = x.shape
    T = min(t_lanes or T_LANES, n)
    hb = stage_h // T                 # partner distance in blocks
    nb = n // T
    s_idx = stage_h.bit_length() - 1  # 0-based stage number = log2(h)
    tws = _stage_twiddles(k, inverse, spec.p, _base_root(spec))
    tw = tws[s_idx]                   # (L, h)
    tw_blocks = jnp.asarray(
        tw.reshape(L, hb, T).transpose(1, 0, 2)).astype(jnp.int32)
    consts = [
        jnp.asarray(np.asarray(v).reshape(L, 1), jnp.int32)
        for v in (spec.p_limbs, spec.sub_pad, spec.c256_limbs)
    ]
    blk_lo = pl.BlockSpec(
        (1, L, T), lambda g, b: (g, 0, b & ~hb),
        memory_space=pltpu.VMEM)
    blk_hi = pl.BlockSpec(
        (1, L, T), lambda g, b: (g, 0, b | hb),
        memory_space=pltpu.VMEM)
    blk_tw = pl.BlockSpec((1, L, T), lambda g, b: (b % hb, 0, 0),
                          memory_space=pltpu.VMEM)
    blk_c = pl.BlockSpec((L, 1), lambda g, b: (0, 0),
                         memory_space=pltpu.VMEM)
    blk_o = pl.BlockSpec((1, L, T), lambda g, b: (g, 0, b),
                         memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel_b, spec, hb),
        out_shape=jax.ShapeDtypeStruct((B, L, n), jnp.int32),
        grid=(B, nb),
        in_specs=[blk_lo, blk_hi, blk_tw] + [blk_c] * 3,
        out_specs=blk_o,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x, x, tw_blocks, *consts)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def ntt_fused(spec: FieldSpec, a, k: int, inverse: bool = False,
              t_lanes: int = 0):
    """Forward/inverse NTT, (L, n) or (B, L, n) — ops/ntt._ntt_core
    parity (natural-order output; inverse divides by n)."""
    squeeze = a.ndim == 2
    if squeeze:
        a = a[None]
    B, _, n = a.shape
    assert n == 1 << k
    perm = jnp.asarray(_bitrev_perm(k))
    x = a[:, :, perm]
    x = _stage_a(spec, x, k, inverse, t_lanes)
    T = min(t_lanes or T_LANES, n)
    h = T
    while h < n:
        x = _stage_b(spec, x, k, h, inverse, t_lanes)
        h *= 2
    if inverse:
        n_inv = pow(n, spec.p - 2, spec.p)
        ninv_l = jnp.asarray(
            ints_to_limbs([n_inv * spec.R % spec.p]), dtype=jnp.int32)
        # modops.montmul contracts over axis 0 (limbs): put limbs first
        x = M.montmul(
            spec, ninv_l[:, None, :], x.transpose(1, 0, 2)
        ).transpose(1, 0, 2)
    return x[0] if squeeze else x


def _interpret() -> bool:
    return jax.default_backend() != "tpu"
