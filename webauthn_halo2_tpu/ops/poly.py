"""Device polynomial utilities: power tables, point evaluation, block sums.

Supports the prover's evaluation phase (SURVEY §3.2: "transcript absorb" of
openings) without host round-trips.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields.limbs import FR_SPEC, FieldSpec, L
from . import modops as M


def mod_sum(spec: FieldSpec, a: jnp.ndarray, block: int = 16) -> jnp.ndarray:
    """Sum along the last axis with lazy-bound-safe blocking -> (L, ..., 1).

    Raw int32 limb sums of `block` lazily-reduced values keep limbs < 2^15
    and values < 2^262; two lazy_reduce passes bring the block sum back into
    the canonical lazy window (< 2^256 + 15p), so each level costs two cheap
    reduces instead of log2(block) modular adds.
    """
    while a.shape[-1] > 1:
        n = a.shape[-1]
        b = min(block, n)
        if n % b:
            pad = b - n % b
            a = jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (pad,), dtype=a.dtype)], axis=-1
            )
            n = a.shape[-1]
        s = jnp.sum(a.reshape(a.shape[:-1] + (n // b, b)), axis=-1)
        a = M.lazy_reduce(spec, M.lazy_reduce(spec, s))
    return a


@functools.partial(jax.jit, static_argnums=(0, 2))
def power_table(spec: FieldSpec, x_mont: jnp.ndarray, n: int) -> jnp.ndarray:
    """(L, 1) Montgomery x -> (L, n) [1, x, x^2, ..., x^(n-1)] (log passes:
    prefix_mul — see its note on associative_scan compile pathology)."""
    one = jnp.asarray(spec.one_mont, jnp.int32).reshape(L, 1)
    seq = jnp.concatenate([one, jnp.broadcast_to(x_mont, (L, n - 1))], axis=1)
    return M.prefix_mul(spec, seq, 1)


@functools.partial(jax.jit, static_argnums=(0,))
def eval_at(spec: FieldSpec, coeffs: jnp.ndarray, xpow: jnp.ndarray) -> jnp.ndarray:
    """Evaluate coeff-form poly at the point whose power table is xpow."""
    nc = coeffs.shape[1]
    return mod_sum(spec, M.montmul(spec, coeffs, xpow[:, :nc]))


def inner_product(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return mod_sum(spec, M.montmul(spec, a, b))
