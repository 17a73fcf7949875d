"""Vectorized modular arithmetic over limb tensors (the device field core).

All functions operate on int32 arrays of shape (L, *batch) in the lazy
Montgomery representation documented in fields/limbs.py. This is the
TPU-native replacement for the `halo2curves` field backend the reference
links against (SURVEY §2.2).

Value-bound discipline (violating it silently corrupts):
  * `montmul` inputs must have value < 2^258.5 and limbs < 2^12;
    output is < 2p with limbs < 2^10 (two carry rounds applied).
  * `lazy_reduce` accepts value < 2^260 / limbs < 2^26 (top limb < 2^13)
    and emits value < 2^256 + 15p with limbs < 2^10.
  * raw `+` composes at most ~4 deep before a `lazy_reduce` is required.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.limbs import B, L, MASK, FieldSpec, int_to_limbs


def _bc(const, ndim: int) -> jnp.ndarray:
    """Reshape an (L,) constant for broadcasting against (L, *batch)."""
    return jnp.asarray(const, dtype=jnp.int32).reshape((L,) + (1,) * (ndim - 1))


def _const_limbs(x: int, ndim: int) -> jnp.ndarray:
    return _bc(int_to_limbs(x), ndim)


def carry_round(a: jnp.ndarray) -> jnp.ndarray:
    """One parallel carry pass; top limb accumulates unsplit (value-preserving)."""
    lo = a & MASK
    hi = a >> B
    shifted = jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)
    out = lo + shifted
    # top limb: undo the split (keep hi there), so no carry-out is lost
    out = out.at[L - 1].add(hi[L - 1] << B)
    return out


def full_carry(a: jnp.ndarray) -> jnp.ndarray:
    """Exact carry propagation via a 33-step scan; limbs 0..31 land in
    [0, 255]; the top limb holds any residual (exact for |value| < 2^270)."""

    def step(carry, limb):
        t = limb + carry
        return t >> B, t & MASK

    carry, limbs = jax.lax.scan(step, jnp.zeros_like(a[0]), a)
    limbs = limbs.at[L - 1].add(carry << B)
    return limbs


@functools.partial(jax.jit, static_argnums=(0,))
def lazy_reduce(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Carry + fold the 2^256 overflow back mod p.

    Input value < 2^260 (limbs < 2^26, top limb < 2^13)
      -> output < 2^256 + 15p, limbs < 2^10.
    """
    a = carry_round(carry_round(a))
    h = a[L - 1]  # coefficient of 2^256; bounded ~2^13 by the input contract
    a = a.at[L - 1].set(0)
    a = a + h * _bc(spec.c256_limbs, a.ndim)
    return carry_round(a)


@functools.partial(jax.jit, static_argnums=(0,))
def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return lazy_reduce(spec, a + b)


@functools.partial(jax.jit, static_argnums=(0,))
def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a - b + (multiple of p > 2^260 > value(b)), then reduce. Non-negative."""
    pad = _bc(spec.sub_pad, a.ndim)
    return lazy_reduce(spec, a + pad - b)


@functools.partial(jax.jit, static_argnums=(0,))
def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    pad = _bc(spec.sub_pad, a.ndim)
    return lazy_reduce(spec, pad - a)


def _montmul_use_pallas(nbatch: int) -> bool:
    """Route big-batch montmuls to the fused Pallas kernel on TPU.

    The XLA lowering materializes each of the 33 CIOS limb shifts as a
    buffer copy; the Pallas kernel keeps the accumulator register/VMEM
    resident (~2x at (33, 2^17), more in chained graphs)."""
    import os

    mode = os.environ.get("WH2_MONTMUL_IMPL", "auto")
    if mode == "xla":
        return False
    from .pallas_kernels import BLOCK

    # High threshold: every distinct shape costs a slow remote Mosaic
    # compile under the tunneled backend, so only the dominant full-column
    # shapes (n=2^17, ext_n=2^19 and scan halves) route to the kernel.
    if nbatch < (1 << 16) or nbatch % BLOCK:
        return False
    return mode == "pallas" or jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnums=(0,))
def montmul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """CIOS Montgomery multiply: a*b*R^-1 mod p (result < 2p, lazy limbs).

    33 unrolled steps; each step is 2 vector MACs over the limb axis.
    acc_j <= 33 * (2^12*2^12 + 2^8*2^8) < 2^29 -- int32-safe throughout.
    """
    a = jnp.broadcast_to(a, jnp.broadcast_shapes(a.shape, b.shape))
    b = jnp.broadcast_to(b, a.shape)
    nbatch = 1
    for d in a.shape[1:]:
        nbatch *= d
    if _montmul_use_pallas(nbatch):
        from .pallas_kernels import montmul_pallas

        out = montmul_pallas(
            spec, a.reshape(L, nbatch), b.reshape(L, nbatch)
        )
        return out.reshape(a.shape)
    p_l = _bc(spec.p_limbs, a.ndim)
    acc = jnp.zeros_like(b)

    def step(i, acc):
        acc = acc + a[i] * b
        m = ((acc[0] & MASK) * spec.pinv8) & MASK
        acc = acc + m * p_l
        carry = acc[0] >> B
        acc = jnp.concatenate([acc[1:], jnp.zeros_like(acc[:1])], axis=0)
        return acc.at[0].add(carry)

    import os

    if os.environ.get("WH2_MONTMUL_LOOP", "0") == "1":
        # rolled CIOS (fori_loop): identical math, ~30x smaller XLA
        # graphs. Used by the CPU multichip dryrun, where every
        # montmul-heavy graph otherwise costs minutes of XLA:CPU compile
        # (the unrolled form is what the TPU path wants).
        acc = jax.lax.fori_loop(0, L, step, acc)
    else:
        for i in range(L):
            acc = step(i, acc)
    # 3 rounds: 2^29-lazy limbs -> <= 255 + 2^5, so chained montmuls and
    # sums of up to 16 outputs stay int32-safe.
    return carry_round(carry_round(carry_round(acc)))


def montsquare(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return montmul(spec, a, a)


@functools.partial(jax.jit, static_argnums=(0, 2))
def mul_const(spec: FieldSpec, a: jnp.ndarray, c: int) -> jnp.ndarray:
    """Multiply by a small non-negative integer constant (c < 2^12)."""
    assert 0 <= c < 1 << 12
    return lazy_reduce(spec, a * c)


@functools.partial(jax.jit, static_argnums=(0,))
def to_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    r2 = jnp.broadcast_to(_const_limbs(spec.r2_mod_p, a.ndim), a.shape)
    return montmul(spec, a, r2)


@functools.partial(jax.jit, static_argnums=(0,))
def from_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    one = jnp.zeros_like(a).at[0].set(1)
    return montmul(spec, a, one)


@functools.partial(jax.jit, static_argnums=(0, 2))
def pow_const(spec: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a static exponent; Montgomery in, Montgomery out.

    Square-and-multiply driven by a lax.scan over the (constant) bit vector
    so the compiled graph stays small (2 montmuls) for huge exponents.
    """
    if e == 0:
        return jnp.broadcast_to(_bc(spec.one_mont, a.ndim), a.shape)
    nbits = e.bit_length()
    bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)], dtype=jnp.int32)

    one = jnp.broadcast_to(_bc(spec.one_mont, a.ndim), a.shape)

    def step(carry, bit):
        result, base = carry
        result = jnp.where(bit > 0, montmul(spec, result, base), result)
        base = montsquare(spec, base)
        return (result, base), None

    (result, _), _ = jax.lax.scan(step, (one, a), bits)
    return result


def inv_fermat(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery inverse via Fermat: mont(x) -> mont(x^-1).

    montmul preserves the Montgomery wrapper through the power chain, so
    pow_const(mont(x), p-2) = mont(x^(p-2)) = mont(x^-1). Zero maps to zero.
    """
    return pow_const(spec, a, spec.p - 2)


@functools.partial(jax.jit, static_argnums=(0,))
def is_zero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Exact zero-test mod p of a lazy value. Returns bool array (*batch).

    REDC by 1 maps the residue class bijectively and bounds the value < 2p,
    so after an exact carry only 0 and p represent zero. ~10x smaller
    compiled graph than comparing against all k*p candidates.
    """
    one = jnp.zeros_like(a).at[0].set(1)
    t = full_carry(montmul(spec, lazy_reduce(spec, a), one))
    p_l = _bc(spec.p_limbs, a.ndim)
    return jnp.all(t == 0, axis=0) | jnp.all(t == p_l, axis=0)


@functools.partial(jax.jit, static_argnums=(0,))
def eq(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return is_zero(spec, sub(spec, a, b))


@functools.partial(jax.jit, static_argnums=(0,))
def normalize(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Canonical residue in [0, p) with tight limbs.

    Interprets the input as a raw residue (call from_mont first if the
    value is Montgomery-form). Used at serialization/transcript boundaries
    and before MSM digit extraction.
    """
    t = full_carry(lazy_reduce(spec, a))  # < 2^256 + 15p, limbs in [0,255]

    def ge_sub(t, k):
        diff = t - _const_limbs(spec.p * k, t.ndim)

        def stepfn(carry, limb):
            v = limb + carry
            return v >> B, v & MASK

        borrow, limbs = jax.lax.scan(stepfn, jnp.zeros_like(t[0]), diff)
        return jnp.where((borrow >= 0)[None], limbs, t)

    for k in (16, 8, 4, 2, 1):
        t = ge_sub(t, k)
    return t


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise field select: cond has batch shape, a/b are (L, *batch)."""
    return jnp.where(cond[None], a, b)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def prefix_mul(spec: FieldSpec, a: jnp.ndarray, axis: int = 1,
               reverse: bool = False) -> jnp.ndarray:
    """Inclusive prefix (or suffix) product along `axis`: explicit
    Hillis-Steele log passes (montmul + pad-shift). NOT
    jax.lax.associative_scan — its odd/even-interleave lowering produces
    graphs the XLA compilers in this environment take tens of minutes on
    at (33, 2^17); these log passes compile like the NTT stages do."""
    n = a.shape[axis]
    one = _bc(spec.one_mont, a.ndim)
    off = 1
    while off < n:
        idx_keep = [slice(None)] * a.ndim
        pad_shape = list(a.shape)
        pad_shape[axis] = off
        ones_blk = jnp.broadcast_to(one, pad_shape)
        if not reverse:
            idx_keep[axis] = slice(0, n - off)
            shifted = jnp.concatenate([ones_blk, a[tuple(idx_keep)]],
                                      axis=axis)
        else:
            idx_keep[axis] = slice(off, n)
            shifted = jnp.concatenate([a[tuple(idx_keep)], ones_blk],
                                      axis=axis)
        a = montmul(spec, a, shifted)
        off *= 2
    return a


@functools.partial(jax.jit, static_argnums=(0, 2))
def batch_inverse(spec: FieldSpec, a: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Montgomery batch inversion along `axis` via two prefix-product
    passes + one Fermat inverse.

    Zeros map to zero (halo2 convention, ref_field.batch_inv parity).
    Cost: ~2 log2(n) montmul passes instead of ~380 for per-element Fermat.
    """
    n = a.shape[axis]
    one = jnp.broadcast_to(_bc(spec.one_mont, a.ndim), a.shape)
    zero_mask = is_zero(spec, a)
    safe = jnp.where(zero_mask[None], one, a)

    prefix = prefix_mul(spec, safe, axis)
    suffix = prefix_mul(spec, safe, axis, True)
    total = jnp.take(prefix, jnp.array([n - 1]), axis=axis)
    total_inv = inv_fermat(spec, total)

    # inv(a_i) = prefix_{i-1} * suffix_{i+1} * total_inv
    shift_fwd = jnp.roll(prefix, 1, axis=axis)
    idx0 = [slice(None)] * a.ndim
    idx0[axis] = slice(0, 1)
    shift_fwd = shift_fwd.at[tuple(idx0)].set(one[tuple(idx0)])
    shift_bwd = jnp.roll(suffix, -1, axis=axis)
    idxn = [slice(None)] * a.ndim
    idxn[axis] = slice(n - 1, n)
    shift_bwd = shift_bwd.at[tuple(idxn)].set(one[tuple(idxn)])

    inv = montmul(spec, montmul(spec, shift_fwd, shift_bwd),
                  jnp.broadcast_to(total_inv, a.shape))
    return jnp.where(zero_mask[None], jnp.zeros_like(a), inv)
