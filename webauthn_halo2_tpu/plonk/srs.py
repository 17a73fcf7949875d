"""Deterministic KZG structured reference string (SRS) generation + cache.

Equivalent of halo2-base `gen_srs` (SURVEY §2.2): the reference generates a
*local, non-production* SRS with OsRng and caches it by degree; we generate a
*deterministic* dev SRS (tau derived from a seed hash) so every host/chip
derives identical parameters — required for multi-host determinism and
reproducible vks. NOT a production trusted setup (neither is the
reference's).

The G1 power tables are produced on-device with an 8-bit fixed-base window
table (32 gathers + 31 complete adds per batch), then batch-normalized to
affine with one inversion scan. Host Python only touches scalars and G2.
"""
from __future__ import annotations

import functools
import hashlib
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.constants import (
    BN254_FQ,
    BN254_FR,
    BN254_G1,
    BN254_G2_X,
    BN254_G2_Y,
)
from ..fields.limbs import FQ_SPEC, FR_SPEC
from ..fields.ref_curve import BN254_G1_CURVE
from ..fields.ref_field import batch_inv
from ..ops import ec as E
from ..ops import modops as M
from ..ops.ntt import root_of_unity

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "artifacts")


# ---------------------------------------------------------------------------
# G2 host arithmetic (tiny: only tau*G2 is needed)
# ---------------------------------------------------------------------------
P = BN254_FQ


def _f2_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def _f2_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def _f2_mul(a, b):
    return (
        (a[0] * b[0] - a[1] * b[1]) % P,
        (a[0] * b[1] + a[1] * b[0]) % P,
    )


def _f2_inv(a):
    d = pow(a[0] * a[0] + a[1] * a[1], -1, P)
    return (a[0] * d % P, (-a[1]) * d % P)


def g2_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    (x1, y1), (x2, y2) = p1, p2
    if x1 == x2:
        if (_f2_add(y1, y2)) == (0, 0):
            return None
        num = _f2_mul((3, 0), _f2_mul(x1, x1))
        den = _f2_inv(_f2_add(y1, y1))
    else:
        num = _f2_sub(y2, y1)
        den = _f2_inv(_f2_sub(x2, x1))
    lam = _f2_mul(num, den)
    x3 = _f2_sub(_f2_sub(_f2_mul(lam, lam), x1), x2)
    y3 = _f2_sub(_f2_mul(lam, _f2_sub(x1, x3)), y1)
    return (x3, y3)


def g2_mul(k, pt):
    acc, add = None, pt
    while k:
        if k & 1:
            acc = g2_add(acc, add)
        add = g2_add(add, add)
        k >>= 1
    return acc


G2_GEN = (BN254_G2_X, BN254_G2_Y)


# ---------------------------------------------------------------------------
# device fixed-base batch scalar multiplication
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _window_table(base: tuple[int, int]) -> np.ndarray:
    """(2, 33, 32*256) Montgomery affine coords of d * 2^(8j) * base.

    Slot (j, d); d == 0 entries are a placeholder with a zero-valid flag
    handled by the complete add (encoded as z=0 through from_affine_ints).
    """
    pts: list[tuple[int, int] | None] = []
    for j in range(32):
        block = base
        for _ in range(8 * j):
            block = BN254_G1_CURVE.add(block, block)
        acc = None
        for d in range(256):
            pts.append(acc)
            acc = BN254_G1_CURVE.add(acc, block)
    jp = E.from_affine_ints(E.BN254_CURVE, pts)
    return np.stack([np.asarray(jp.x), np.asarray(jp.y), np.asarray(jp.z)])


@functools.partial(jax.jit, static_argnums=())
def _fixed_base_mul_dev(table: jnp.ndarray, digits: jnp.ndarray) -> E.JPoint:
    """table: (3, 33, 8192); digits: (32, n) byte digits of the scalars."""

    def body(j, acc):
        idx = j * 256 + digits[j]
        pt = E.JPoint(table[0][:, idx], table[1][:, idx], table[2][:, idx])
        return E.add(E.BN254_CURVE, acc, pt)

    n = digits.shape[1]
    acc = E.infinity((n,), E.BN254_CURVE)
    return jax.lax.fori_loop(0, 32, body, acc)


def to_affine_batch(curve: E.CurveSpec, pts: E.JPoint) -> E.JPoint:
    """Batch Jacobian -> affine (z in {0,1} flags preserved) on device."""
    f = curve.field
    zinv = M.batch_inverse(f, pts.z, axis=1)
    zi2 = M.montsquare(f, zinv)
    zi3 = M.montmul(f, zi2, zinv)
    x = M.montmul(f, pts.x, zi2)
    y = M.montmul(f, pts.y, zi3)
    inf = M.is_zero(f, pts.z)
    one = jnp.broadcast_to(
        jnp.asarray(f.one_mont, jnp.int32).reshape((33,) + (1,) * (x.ndim - 1)),
        x.shape,
    )
    z = jnp.where(inf[None], jnp.zeros_like(x), one)
    return E.JPoint(x, y, z)


def fixed_base_msm_points(base: tuple[int, int], scalars: list[int],
                          chunk: int = 1 << 16) -> E.JPoint:
    """Host scalars -> device affine points [s_i * base], chunked."""
    table = jnp.asarray(_window_table(base))
    outs = []
    for lo in range(0, len(scalars), chunk):
        part = scalars[lo : lo + chunk]
        digits = np.zeros((32, len(part)), dtype=np.int32)
        for col, s in enumerate(part):
            for j in range(32):
                digits[j, col] = (s >> (8 * j)) & 255
        acc = _fixed_base_mul_dev(table, jnp.asarray(digits))
        outs.append(to_affine_batch(E.BN254_CURVE, acc))
    return E.JPoint(
        jnp.concatenate([o.x for o in outs], axis=1),
        jnp.concatenate([o.y for o in outs], axis=1),
        jnp.concatenate([o.z for o in outs], axis=1),
    )


# ---------------------------------------------------------------------------
# the SRS object
# ---------------------------------------------------------------------------

@dataclass
class SRS:
    k: int
    tau_seed: bytes
    # device-resident Montgomery affine points, shape (L, n) each coord
    g_mono: E.JPoint  # [tau^i G]
    g_lag: E.JPoint  # [L_i(tau) G]
    g2: tuple
    s_g2: tuple

    @property
    def n(self) -> int:
        return 1 << self.k

    def g1_ints(self, lagrange: bool = False) -> list:
        pts = self.g_lag if lagrange else self.g_mono
        return E.to_affine_ints(E.BN254_CURVE, pts)


def derive_tau(seed: bytes) -> int:
    h = hashlib.blake2b(b"webauthn-halo2-tpu/dev-srs/" + seed, digest_size=64)
    return int.from_bytes(h.digest(), "little") % BN254_FR


def generate_srs(k: int, seed: bytes = b"dev") -> SRS:
    n = 1 << k
    r = BN254_FR
    tau = derive_tau(seed)

    powers = [1] * n
    for i in range(1, n):
        powers[i] = powers[i - 1] * tau % r

    # L_i(tau) = omega^i (tau^n - 1) / (n (tau - omega^i))  (barycentric)
    w = root_of_unity(k)
    wpow = [1] * n
    for i in range(1, n):
        wpow[i] = wpow[i - 1] * w % r
    zh = (pow(tau, n, r) - 1) % r
    if zh == 0:
        raise ValueError("tau landed in the domain; pick another seed")
    denoms = batch_inv([(tau - wi) % r for wi in wpow], r)
    ninv = pow(n, -1, r)
    lag = [wi * zh % r * d % r * ninv % r for wi, d in zip(wpow, denoms)]

    g_mono = fixed_base_msm_points(BN254_G1, powers)
    g_lag = fixed_base_msm_points(BN254_G1, lag)
    s_g2 = g2_mul(tau, G2_GEN)
    return SRS(k, seed, g_mono, g_lag, G2_GEN, s_g2)


def _points_to_np(pts: E.JPoint) -> np.ndarray:
    return np.stack([np.asarray(pts.x), np.asarray(pts.y), np.asarray(pts.z)])


def save_srs(srs: SRS, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(
        path,
        k=srs.k,
        seed=np.frombuffer(srs.tau_seed, dtype=np.uint8),
        g_mono=_points_to_np(srs.g_mono),
        g_lag=_points_to_np(srs.g_lag),
        g2=np.array([list(srs.g2[0]), list(srs.g2[1])], dtype=object),
        s_g2=np.array([list(srs.s_g2[0]), list(srs.s_g2[1])], dtype=object),
    )


def _normalize_host_limbs(a: np.ndarray, p: int) -> np.ndarray:
    """Exact host normalization of lazy (L, n) limb arrays to canonical
    tight limbs (< p, every limb <= 255).

    to_affine_batch leaves coordinates LAZY (montmul output: value < 2p,
    limbs can exceed 255). The v2+ MSM kernels consume coordinates as
    packed 32-byte words (ops/limbvec.pack_words), which silently corrupt
    non-tight limbs — so SRS points are canonicalized once here."""
    from ..fields.limbs import B, L, MASK, int_to_limbs

    a = a.astype(np.int64)
    out = np.empty_like(a)
    carry = np.zeros(a.shape[1:], dtype=np.int64)
    for i in range(L):
        v = a[i] + carry
        out[i] = v & MASK
        carry = v >> B
    assert not carry.any(), "limb overflow beyond 2^264"
    # conditional subtract p where value >= p (lexicographic compare)
    p_l = int_to_limbs(p).astype(np.int64)
    ge = np.ones(a.shape[1:], dtype=bool)
    decided = np.zeros(a.shape[1:], dtype=bool)
    for i in range(L - 1, -1, -1):
        gt = ~decided & (out[i] > p_l[i])
        lt = ~decided & (out[i] < p_l[i])
        ge = np.where(lt, False, ge)
        decided |= gt | lt
    borrow = np.zeros(a.shape[1:], dtype=np.int64)
    for i in range(L):
        v = out[i] - np.where(ge, p_l[i], 0) - borrow
        borrow = (v < 0).astype(np.int64)
        out[i] = np.where(ge, v + (borrow << B), out[i])
    return out.astype(np.int32)


def _normalize_points_np(coords: np.ndarray) -> np.ndarray:
    """(3, L, n) stacked Jacobian coords -> canonical limbs (z rows with
    exact-zero infinity flags are preserved: normalize(0) == 0)."""
    from ..fields.constants import BN254_FQ

    return np.stack([
        _normalize_host_limbs(np.asarray(coords[i]), BN254_FQ)
        for i in range(3)
    ])


def load_srs(path: str) -> SRS:
    z = np.load(path, allow_pickle=True)
    gm = _normalize_points_np(z["g_mono"])
    gl = _normalize_points_np(z["g_lag"])
    g2 = z["g2"]
    sg2 = z["s_g2"]
    return SRS(
        int(z["k"]),
        bytes(z["seed"].tobytes()),
        E.JPoint(jnp.asarray(gm[0]), jnp.asarray(gm[1]), jnp.asarray(gm[2])),
        E.JPoint(jnp.asarray(gl[0]), jnp.asarray(gl[1]), jnp.asarray(gl[2])),
        (tuple(int(v) for v in g2[0]), tuple(int(v) for v in g2[1])),
        (tuple(int(v) for v in sg2[0]), tuple(int(v) for v in sg2[1])),
    )


_SRS_MEM_CACHE: dict[tuple[int, bytes], SRS] = {}


def get_srs(k: int, seed: bytes = b"dev", cache_dir: str | None = None) -> SRS:
    """Load-or-generate, with in-memory and on-disk caches (gen_srs parity:
    the reference reloads params per request — main.rs:49-63 — we do not)."""
    key = (k, seed)
    if key in _SRS_MEM_CACHE:
        return _SRS_MEM_CACHE[key]
    cache_dir = cache_dir or os.environ.get(
        "WH2_SRS_DIR", os.path.abspath(DEFAULT_CACHE_DIR)
    )
    path = os.path.join(cache_dir, f"srs_bn254_k{k}_{seed.hex()}.npz")
    if os.path.exists(path):
        srs = load_srs(path)
    else:
        srs = generate_srs(k, seed)
        save_srs(srs, path)
        srs = load_srs(path)  # round-trip: canonical tight limbs
    _SRS_MEM_CACHE[key] = srs
    return srs
