"""Pallas TPU kernels for the field-arithmetic hot loops.

The north-star kernels (BASELINE.json): Montgomery multiplication and the
fused curve operations, written against the Pallas TPU API
(/opt/skills/guides/pallas_guide.md). The payoff vs plain XLA is HBM
traffic: a fused kernel keeps all CIOS intermediates — and for the fused
EC add, all twelve montmuls' operands — in VMEM/registers, so each batch
element moves through HBM once per point-op instead of once per field-op.

Kernels are opt-in (WH2_PALLAS=1) while the XLA path remains the default;
`tests/test_pallas.py` cross-checks them against ops/modops.py in
interpret mode on CPU and compiled on TPU.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limbs import B, L, MASK, FieldSpec
from . import modops as M

BLOCK = 512  # lanes per grid step (multiple of 128)


def _montmul_body(spec: FieldSpec, a, b, p_col):
    """CIOS Montgomery multiply on register-resident (L, BLOCK) values.

    Identical math to modops.montmul; p_col is the (L, 1) modulus tensor
    passed as a kernel input (Pallas kernels cannot capture array consts).
    """
    # note: no .at[] updates — Mosaic has no scatter; rows are rebuilt
    # with concatenates (which lower to VMEM shuffles)
    acc = jnp.zeros_like(b)
    for i in range(L):
        acc = acc + a[i] * b
        m = ((acc[0] & MASK) * spec.pinv8) & MASK
        acc = acc + m * p_col
        carry = acc[0] >> B
        acc = jnp.concatenate(
            [acc[1:2] + carry[None], acc[2:], jnp.zeros_like(acc[:1])], axis=0
        )
    # 3 carry rounds (same bounds as modops.montmul)
    for _ in range(3):
        acc = _carry_round_body(acc)
    return acc


def _carry_round_body(acc):
    lo = acc & MASK
    hi = acc >> B
    shifted = jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)
    out = lo + shifted
    top = out[L - 1 :] + (hi[L - 1 :] << B)
    return jnp.concatenate([out[: L - 1], top], axis=0)


def _montmul_kernel(spec, a_ref, b_ref, p_ref, o_ref):
    o_ref[:, :] = _montmul_body(spec, a_ref[:, :], b_ref[:, :], p_ref[:, :])


@functools.partial(jax.jit, static_argnums=(0,))
def montmul_pallas(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Drop-in montmul for (L, n) operands with n a multiple of BLOCK."""
    n = a.shape[1]
    assert a.shape == b.shape == (L, n) and n % BLOCK == 0
    grid = (n // BLOCK,)
    import numpy as _np

    p_col = jnp.asarray(_np.asarray(spec.p_limbs).reshape(L, 1), jnp.int32)
    return pl.pallas_call(
        functools.partial(_montmul_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (L, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(a, b, p_col)


def _lazy_reduce_body(spec: FieldSpec, acc, c256):
    for _ in range(2):
        acc = _carry_round_body(acc)
    h = acc[L - 1]
    acc = jnp.concatenate([acc[: L - 1], jnp.zeros_like(acc[:1])], axis=0)
    acc = acc + h * c256
    return _carry_round_body(acc)


def _sub_body(spec: FieldSpec, a, b, pad, c256):
    return _lazy_reduce_body(spec, a + pad - b, c256)


def _ec_add_unsafe_kernel(spec, x1r, y1r, z1r, x2r, y2r, z2r,
                          pr, padr, c256r, xo, yo, zo):
    """Fused Jacobian add (infinity-complete): 12 montmuls, one HBM pass."""
    p_col = pr[:, :]
    pad = padr[:, :]
    c256 = c256r[:, :]
    mm = lambda a, b: _montmul_body(spec, a, b, p_col)  # noqa: E731
    sub = lambda a, b: _sub_body(spec, a, b, pad, c256)  # noqa: E731
    x1, y1, z1 = x1r[:, :], y1r[:, :], z1r[:, :]
    x2, y2, z2 = x2r[:, :], y2r[:, :], z2r[:, :]
    z1z1 = mm(z1, z1)
    z2z2 = mm(z2, z2)
    u1 = mm(x1, z2z2)
    u2 = mm(x2, z1z1)
    s1 = mm(y1, mm(z2, z2z2))
    s2 = mm(y2, mm(z1, z1z1))
    h = sub(u2, u1)
    rv = sub(s2, s1)
    hh = mm(h, h)
    hhh = mm(h, hh)
    v = mm(u1, hh)
    rr = mm(rv, rv)
    x3 = sub(sub(rr, hhh), _lazy_reduce_body(spec, v * 2, c256))
    y3 = sub(mm(rv, sub(v, x3)), mm(s1, hhh))
    z3 = mm(mm(z1, z2), h)
    inf1 = jnp.all(z1 == 0, axis=0)
    inf2 = jnp.all(z2 == 0, axis=0)
    xo[:, :] = jnp.where(inf1[None], x2, jnp.where(inf2[None], x1, x3))
    yo[:, :] = jnp.where(inf1[None], y2, jnp.where(inf2[None], y1, y3))
    zo[:, :] = jnp.where(inf1[None], z2, jnp.where(inf2[None], z1, z3))


@functools.partial(jax.jit, static_argnums=(0,))
def ec_add_unsafe_pallas(spec: FieldSpec, p1, p2):
    """Fused add_unsafe over coordinate arrays ((L, n) x 3 per point)."""
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    n = x1.shape[1]
    assert n % BLOCK == 0
    grid = (n // BLOCK,)
    import numpy as _np

    spec_b = pl.BlockSpec((L, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    consts = [
        jnp.asarray(_np.asarray(v).reshape(L, 1), jnp.int32)
        for v in (spec.p_limbs, spec.sub_pad, spec.c256_limbs)
    ]
    out = pl.pallas_call(
        functools.partial(_ec_add_unsafe_kernel, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, n), jnp.int32) for _ in range(3)
        ),
        grid=grid,
        in_specs=[spec_b] * 6 + [spec_c] * 3,
        out_specs=(spec_b, spec_b, spec_b),
        interpret=_interpret(),
    )(x1, y1, z1, x2, y2, z2, *consts)
    return out


def _interpret() -> bool:
    import jax as _j

    return _j.default_backend() != "tpu"
