"""Vectorized Jacobian elliptic-curve arithmetic over limb tensors.

The device-side bn254-G1 engine behind KZG commitments / MSM — the TPU
equivalent of `halo2curves` G1 ops driven by `halo2_proofs`' commit path
(SURVEY §2.2, §3.2). All coordinates are (L, *batch) int32 Montgomery limbs
over Fq. Z == 0 encodes the point at infinity.

Additions are *complete*: degenerate cases (P == Q, P == -Q, infinities)
are resolved with vectorized selects, so bucket/scan reductions never
mis-add. Costs ~1.6x a bare Jacobian add; dedicated fast paths can come
later for kernels where degeneracy is excluded structurally.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.constants import BN254_B, BN254_FQ
from ..fields.limbs import FQ_SPEC, FieldSpec, L
from . import modops as M


class JPoint(NamedTuple):
    x: jnp.ndarray  # (L, *batch)
    y: jnp.ndarray
    z: jnp.ndarray


@dataclass(frozen=True)
class CurveSpec:
    field: FieldSpec
    a: int  # short Weierstrass a (0 for bn254)
    b: int

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


BN254_CURVE = CurveSpec(FQ_SPEC, 0, BN254_B)


def infinity(batch_shape=(), curve: CurveSpec = BN254_CURVE) -> JPoint:
    z = jnp.zeros((L,) + tuple(batch_shape), dtype=jnp.int32)
    one = jnp.broadcast_to(
        jnp.asarray(curve.field.one_mont, jnp.int32).reshape(
            (L,) + (1,) * len(batch_shape)
        ),
        (L,) + tuple(batch_shape),
    )
    return JPoint(one, one, z)


def from_affine_ints(curve: CurveSpec, pts: list[tuple[int, int] | None]) -> JPoint:
    """Host affine int points -> device Jacobian Montgomery limbs (L, n)."""
    f = curve.field
    xs = [p[0] if p else 0 for p in pts]
    ys = [p[1] if p else 1 for p in pts]
    zs = [0 if p is None else 1 for p in pts]
    return JPoint(
        jnp.asarray(f.encode(xs)),
        jnp.asarray(f.encode(ys)),
        jnp.asarray(f.encode(zs)),
    )


def to_affine_ints(curve: CurveSpec, pt: JPoint) -> list[tuple[int, int] | None]:
    """Device Jacobian point(s) -> host affine ints (cold path)."""
    f = curve.field
    xs = f.decode(np.asarray(pt.x))
    ys = f.decode(np.asarray(pt.y))
    zs = f.decode(np.asarray(pt.z))
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, f.p)
            out.append((x * zi * zi % f.p, y * zi ** 3 % f.p))
    return out


def point_select(cond: jnp.ndarray, a: JPoint, b: JPoint) -> JPoint:
    return JPoint(
        M.select(cond, a.x, b.x), M.select(cond, a.y, b.y), M.select(cond, a.z, b.z)
    )


@functools.partial(jax.jit, static_argnums=(0,))
def neg(curve: CurveSpec, p: JPoint) -> JPoint:
    return JPoint(p.x, M.neg(curve.field, p.y), p.z)


@functools.partial(jax.jit, static_argnums=(0,))
def double(curve: CurveSpec, p: JPoint) -> JPoint:
    """Jacobian doubling; correct for Z=0 (stays at infinity) and y=0."""
    f = curve.field
    X, Y, Z = p
    A = M.montsquare(f, X)
    Bv = M.montsquare(f, Y)
    C = M.montsquare(f, Bv)
    t = M.montsquare(f, M.add(f, X, Bv))
    D = M.mul_const(f, M.sub(f, M.sub(f, t, A), C), 2)
    E = M.mul_const(f, A, 3)
    if curve.a != 0:
        z2 = M.montsquare(f, Z)
        z4 = M.montsquare(f, z2)
        a_l = jnp.broadcast_to(
            jnp.asarray(f.encode([curve.a]), jnp.int32).reshape(
                (L,) + (1,) * (X.ndim - 1)
            ),
            X.shape,
        )
        E = M.add(f, E, M.montmul(f, a_l, z4))
    F = M.montsquare(f, E)
    X3 = M.sub(f, F, M.mul_const(f, D, 2))
    Y3 = M.sub(f, M.montmul(f, E, M.sub(f, D, X3)), M.mul_const(f, C, 8))
    Z3 = M.montmul(f, M.mul_const(f, Y, 2), Z)
    return JPoint(X3, Y3, Z3)


@functools.partial(jax.jit, static_argnums=(0,))
def add(curve: CurveSpec, p: JPoint, q: JPoint) -> JPoint:
    """Complete Jacobian addition (handles P==Q, P==-Q, infinities)."""
    f = curve.field
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    z1_zero = M.is_zero(f, Z1)
    z2_zero = M.is_zero(f, Z2)

    Z1Z1 = M.montsquare(f, Z1)
    Z2Z2 = M.montsquare(f, Z2)
    U1 = M.montmul(f, X1, Z2Z2)
    U2 = M.montmul(f, X2, Z1Z1)
    S1 = M.montmul(f, Y1, M.montmul(f, Z2, Z2Z2))
    S2 = M.montmul(f, Y2, M.montmul(f, Z1, Z1Z1))
    H = M.sub(f, U2, U1)
    R = M.sub(f, S2, S1)
    h_zero = M.is_zero(f, H)
    r_zero = M.is_zero(f, R)

    HH = M.montsquare(f, H)
    HHH = M.montmul(f, H, HH)
    V = M.montmul(f, U1, HH)
    RR = M.montsquare(f, R)
    X3 = M.sub(f, M.sub(f, RR, HHH), M.mul_const(f, V, 2))
    Y3 = M.sub(f, M.montmul(f, R, M.sub(f, V, X3)), M.montmul(f, S1, HHH))
    Z3 = M.montmul(f, M.montmul(f, Z1, Z2), H)
    added = JPoint(X3, Y3, Z3)

    doubled = double(curve, p)
    # P == Q (same x and y): use doubling; P == -Q: infinity
    same = h_zero & r_zero & ~z1_zero & ~z2_zero
    opposite = h_zero & ~r_zero & ~z1_zero & ~z2_zero

    out = point_select(same, doubled, added)
    inf = infinity(X1.shape[1:], curve)
    out = point_select(opposite, inf, out)
    out = point_select(z1_zero, q, out)
    out = point_select(z2_zero, p, out)
    # both infinity -> q is infinity -> fine (z1_zero select returns q)
    return out


def _z_literal_zero(z: jnp.ndarray) -> jnp.ndarray:
    """Infinity test under the literal-zero-Z invariant (cheap).

    Points constructed by infinity()/from_affine_ints carry exactly-zero Z
    limbs, and montmul/select preserve literal zeros, so this is exact for
    points flowing through add_unsafe/double.
    """
    return jnp.all(z == 0, axis=0)


@functools.partial(jax.jit, static_argnums=(0,))
def add_unsafe(curve: CurveSpec, p: JPoint, q: JPoint) -> JPoint:
    """Jacobian add handling infinities only — NOT the P==+-Q cases.

    Safe wherever operands are sums of disjoint subsets of distinct base
    points (Pippenger bucket/segment accumulation): a degenerate hit would
    exhibit a nontrivial linear relation among fixed SRS points, which is
    cryptographically negligible. ~3x smaller graph than `add`.
    """
    f = curve.field
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    z1_zero = _z_literal_zero(Z1)
    z2_zero = _z_literal_zero(Z2)

    Z1Z1 = M.montsquare(f, Z1)
    Z2Z2 = M.montsquare(f, Z2)
    U1 = M.montmul(f, X1, Z2Z2)
    U2 = M.montmul(f, X2, Z1Z1)
    S1 = M.montmul(f, Y1, M.montmul(f, Z2, Z2Z2))
    S2 = M.montmul(f, Y2, M.montmul(f, Z1, Z1Z1))
    H = M.sub(f, U2, U1)
    Rv = M.sub(f, S2, S1)
    HH = M.montsquare(f, H)
    HHH = M.montmul(f, H, HH)
    V = M.montmul(f, U1, HH)
    RR = M.montsquare(f, Rv)
    X3 = M.sub(f, M.sub(f, RR, HHH), M.mul_const(f, V, 2))
    Y3 = M.sub(f, M.montmul(f, Rv, M.sub(f, V, X3)), M.montmul(f, S1, HHH))
    Z3 = M.montmul(f, M.montmul(f, Z1, Z2), H)
    out = JPoint(X3, Y3, Z3)
    out = point_select(z1_zero, q, out)
    out = point_select(z2_zero, p, out)
    return out


def add_unsafe_fast(curve: CurveSpec, p: JPoint, q: JPoint) -> JPoint:
    """add_unsafe via the fused Pallas kernel when WH2_PALLAS=1 (padding
    the batch to the kernel block size), else the XLA path."""
    import os

    n = p.x.shape[-1]
    if not os.environ.get("WH2_PALLAS") or p.x.ndim != 2:
        return add_unsafe(curve, p, q)
    from .pallas_kernels import BLOCK, ec_add_unsafe_pallas

    pad = (-n) % BLOCK
    if pad:
        inf = infinity((pad,), curve)

        def cat(a, b):
            return jnp.concatenate([a, b], axis=1)

        p = JPoint(cat(p.x, inf.x), cat(p.y, inf.y), cat(p.z, inf.z))
        q = JPoint(cat(q.x, inf.x), cat(q.y, inf.y), cat(q.z, inf.z))
    x, y, z = ec_add_unsafe_pallas(
        curve.field, (p.x, p.y, p.z), (q.x, q.y, q.z)
    )
    return JPoint(x[:, :n], y[:, :n], z[:, :n])


@functools.partial(jax.jit, static_argnums=(0,))
def scalar_mul(curve: CurveSpec, scalar_bits: jnp.ndarray, p: JPoint) -> JPoint:
    """Batched double-and-add: scalar_bits is (nbits, *batch) int32 of 0/1,
    little-endian. Used for SRS generation and tests (cold path; MSM is the
    hot path and lives in msm.py). Scan keeps the compiled graph small."""
    acc = infinity(p.x.shape[1:], curve)

    def step(carry, bit):
        acc, base = carry
        cand = add(curve, acc, base)
        acc = point_select(bit > 0, cand, acc)
        base = double(curve, base)
        return (acc, base), None

    (acc, _), _ = jax.lax.scan(step, (acc, p), scalar_bits)
    return acc


@functools.partial(jax.jit, static_argnums=(0,))
def is_on_curve(curve: CurveSpec, p: JPoint) -> jnp.ndarray:
    """y^2 == x^3 + a x z^4 + b z^6 (projective check); infinity passes."""
    f = curve.field
    X, Y, Z = p
    y2 = M.montsquare(f, Y)
    x3 = M.montmul(f, M.montsquare(f, X), X)
    z2 = M.montsquare(f, Z)
    z4 = M.montsquare(f, z2)
    z6 = M.montmul(f, z4, z2)
    b_l = jnp.broadcast_to(
        jnp.asarray(f.encode([curve.b]), jnp.int32).reshape((L,) + (1,) * (X.ndim - 1)),
        X.shape,
    )
    rhs = M.add(f, x3, M.montmul(f, b_l, z6))
    if curve.a != 0:
        a_l = jnp.broadcast_to(
            jnp.asarray(f.encode([curve.a]), jnp.int32).reshape(
                (L,) + (1,) * (X.ndim - 1)
            ),
            X.shape,
        )
        rhs = M.add(f, rhs, M.montmul(f, M.montmul(f, a_l, X), z4))
    return M.is_zero(f, M.sub(f, y2, rhs)) | M.is_zero(f, Z)
