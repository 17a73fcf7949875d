"""Limb codec + per-modulus precomputed constants for device field arithmetic.

Representation (TPU-first design, see SURVEY §7.1):
  A field element is a vector of L=33 little-endian limbs of B=8 bits each,
  stored as int32, laid out limb-major: shape (33, *batch). The batch axis
  lands on TPU vector lanes; the limb axis is the short leading axis.

  * 8-bit limbs keep every partial product (<= 2^16 * laziness) safely inside
    an int32 accumulator through a full 33-step CIOS Montgomery multiply, so
    no multi-word carries are needed on the VPU.
  * L=33 (264 bits) gives Montgomery R = 2^264 >= 2^10 * p headroom, which
    lets us run a *lazy* arithmetic discipline: device values are allowed in
    [0, 2^256 + 15p) between reductions, and limbs are allowed to exceed 255
    transiently (bounded < 2^12 at every multiply input).

Montgomery form: x_mont = x * R mod p. All device-resident polynomial /
coordinate data is Montgomery-form; conversions happen only at host
boundaries (transcripts, serialization).

The reference gets this from `halo2curves` bigint arithmetic (SURVEY §2.2);
here it is rebuilt natively for the TPU VPU.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

L = 33  # limbs per element
B = 8  # bits per limb
MASK = (1 << B) - 1


def int_to_limbs(x: int, length: int = L) -> np.ndarray:
    """Python int -> (length,) int32 limb vector (little-endian base 2^8)."""
    assert 0 <= x < 1 << (B * length)
    return np.array([(x >> (B * i)) & MASK for i in range(length)], dtype=np.int32)


def limbs_to_int(a) -> int:
    """Limb vector (any laziness, possibly negative limbs) -> Python int."""
    a = np.asarray(a).reshape(-1)
    return sum(int(v) << (B * i) for i, v in enumerate(a))


def ints_to_limbs(xs, length: int = L) -> np.ndarray:
    """Batch: list of ints -> (length, n) int32."""
    out = np.zeros((length, len(xs)), dtype=np.int32)
    for j, x in enumerate(xs):
        out[:, j] = int_to_limbs(x, length)
    return out


def ints_to_limbs_fast(xs, length: int = L) -> np.ndarray:
    """Vectorized batch codec: list of ints -> (length, n) int32.

    ~30x faster than ints_to_limbs for 2^17-size columns (bytes-based).
    """
    b = b"".join(int(x).to_bytes(length, "little") for x in xs)
    return (
        np.frombuffer(b, dtype=np.uint8)
        .reshape(len(xs), length)
        .T.astype(np.int32)
        .copy()
    )


def limbs_to_ints_fast(a) -> list[int]:
    """(length, n) TIGHT non-negative limbs -> list of ints (vectorized)."""
    arr = np.asarray(a)
    assert arr.min() >= 0 and arr.max() <= 255, "limbs must be normalized"
    raw = arr.T.astype(np.uint8).tobytes()
    ln = arr.shape[0]
    return [
        int.from_bytes(raw[i * ln : (i + 1) * ln], "little")
        for i in range(arr.shape[1])
    ]


def limbs_to_ints(a) -> list[int]:
    """(length, n) limb array -> list of n Python ints."""
    a = np.asarray(a)
    n = a.shape[1] if a.ndim > 1 else 1
    a = a.reshape(a.shape[0], -1)
    return [sum(int(a[i, j]) << (B * i) for i in range(a.shape[0])) for j in range(a.shape[1])]


@dataclass(eq=False)
class FieldSpec:
    """Precomputed constants for one prime modulus.

    Hash/eq are identity-based so a spec can be a static jit argument.
    """

    name: str
    p: int
    # derived (filled in __post_init__)
    R: int = 0
    r_mod_p: int = 0
    r2_mod_p: int = 0
    pinv8: int = 0  # (-p)^-1 mod 2^8
    p_limbs: np.ndarray = field(default=None)  # (L,)
    c256_limbs: np.ndarray = field(default=None)  # limbs of 2^256 mod p, (L,)
    one_mont: np.ndarray = field(default=None)  # R mod p, (L,)
    sub_pad: np.ndarray = field(default=None)  # multiple of p >= 2^259, (L,)

    def __post_init__(self):
        p = self.p
        self.R = 1 << (B * L)
        self.r_mod_p = self.R % p
        self.r2_mod_p = self.R * self.R % p
        self.pinv8 = (-pow(p, -1, 1 << B)) % (1 << B)
        self.p_limbs = int_to_limbs(p)
        self.c256_limbs = int_to_limbs((1 << 256) % p)
        self.one_mont = int_to_limbs(self.r_mod_p)
        # smallest multiple of p that dominates any lazy device value (< 2^260)
        pad = ((1 << 260) + p - 1) // p * p
        assert pad < 1 << 262
        self.sub_pad = int_to_limbs(pad)

    # --- host-side helpers (oracle / boundaries) ---
    def to_mont_int(self, x: int) -> int:
        return x * self.R % self.p

    def from_mont_int(self, x: int) -> int:
        return x * pow(self.R, -1, self.p) % self.p

    def encode(self, xs, mont: bool = True) -> np.ndarray:
        """Host ints -> (L, n) device limbs (Montgomery form by default)."""
        if mont:
            xs = [self.to_mont_int(x % self.p) for x in xs]
        else:
            xs = [x % self.p for x in xs]
        return ints_to_limbs(xs)

    def decode(self, a, mont: bool = True) -> list[int]:
        """(L, n) device limbs (any laziness) -> canonical host ints."""
        vals = [v % self.p for v in limbs_to_ints(np.asarray(a))]
        if mont:
            rinv = pow(self.R, -1, self.p)
            vals = [v * rinv % self.p for v in vals]
        return vals

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


# Singleton specs for the two hot moduli (SURVEY §2.2: halo2curves equivalent)
from .constants import BN254_FQ, BN254_FR, P256_N, P256_P  # noqa: E402

FQ_SPEC = FieldSpec("bn254_fq", BN254_FQ)
FR_SPEC = FieldSpec("bn254_fr", BN254_FR)
P256_P_SPEC = FieldSpec("p256_fp", P256_P)
P256_N_SPEC = FieldSpec("p256_fq", P256_N)
