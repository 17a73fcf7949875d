"""List-form field arithmetic bodies for Pallas kernels (v2 hot path).

The round-3 kernels kept each field element as a stacked (L=33, K) int32
array inside the kernel. That shape makes every CIOS iteration pay a
full-array `jnp.concatenate` (a cross-sublane shuffle of ~80 vregs) just
to shift the accumulator down one limb, and pads 33 sublanes to 40.

Here an element is a Python LIST of L tiles, each shaped (SUB, LANES)
(one (8, 128)-aligned vreg block per limb; K = SUB*LANES independent
elements). Consequences:

  * the CIOS limb shift is list reindexing — free at trace time;
  * every op is a full-rate elementwise VPU op on exactly-aligned tiles;
  * modulus/pad/one constants are PYTHON INTS baked into the kernel as
    scalar immediates — no more (L, 1) constant refs or broadcasts.

The math is identical to ops/modops.py (CIOS Montgomery multiply, lazy
[0, 2^256 + 15p) discipline, 2^256-fold reduction); bit-exactness is
asserted against the stacked-path kernels and the host oracle in
tests/test_msm_pallas_v2.py. Replaces the rayon MSM/field internals of
`halo2_proofs` (SURVEY §2.2) on the TPU-native path.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fields.limbs import B, L, MASK, FieldSpec

__all__ = [
    "spec_consts", "unpack_words", "pack_words",
    "pack16", "unpack16", "pack16_stacked", "unpack16_stacked",
    "mm", "lazy_reduce", "sub", "carry_round", "is_zero",
    "madd", "jadd_unsafe", "jdouble", "jadd_complete",
]

PW = 17  # 16-bit-packed words per element (2 limbs/word, 33rd solo)


def pack16(limbs: list) -> list:
    """L lazy limb tiles (< 2^15 each — montmul outputs are <= ~2^9) ->
    PW int32 word tiles. Halves the HBM bytes of the emit/bucket streams
    and the fill gather."""
    out = [limbs[2 * w] + (limbs[2 * w + 1] << 16)
           for w in range(L // 2)]
    out.append(limbs[L - 1])
    return out


def unpack16(words: list) -> list:
    limbs = []
    for w in range(L // 2):
        limbs.append(words[w] & 0xFFFF)
        limbs.append(words[w] >> 16)
    limbs.append(words[L // 2])
    return limbs


def pack16_stacked(x):
    """(L, ...) stacked -> (PW, ...)."""
    import jax.numpy as _jnp

    rows = [x[2 * w] + (x[2 * w + 1] << 16) for w in range(L // 2)]
    return _jnp.concatenate(
        [_jnp.stack(rows), x[L - 1:L]], axis=0)


def unpack16_stacked(w):
    """(PW, ...) -> (L, ...) stacked."""
    import jax.numpy as _jnp

    rows = []
    for i in range(L // 2):
        rows.append(w[i] & 0xFFFF)
        rows.append(w[i] >> 16)
    rows.append(w[L // 2])
    return _jnp.stack(rows)


def pack16_host(limbs: np.ndarray) -> np.ndarray:
    """(L, ...) tight numpy limbs -> (PW, ...) int32 words."""
    a = limbs.astype(np.int64)
    rows = [a[2 * w] + (a[2 * w + 1] << 16) for w in range(L // 2)]
    return np.concatenate(
        [np.stack(rows), a[L - 1:L]], axis=0).astype(np.int32)


def spec_consts(spec: FieldSpec) -> dict:
    """Per-spec Python-int constant lists for kernel closures."""
    return {
        "p": [int(v) for v in np.asarray(spec.p_limbs)],
        "one": [int(v) for v in np.asarray(spec.one_mont)],
        "pad": [int(v) for v in np.asarray(spec.sub_pad)],
        "c256": [int(v) for v in np.asarray(spec.c256_limbs)],
        "pinv8": int(spec.pinv8),
    }


# --------------------------------------------------------------------------
# packing: 4 tight 8-bit limbs per int32 word (LE), 32 bytes per element
# --------------------------------------------------------------------------

NW = 8  # uint32 words per 256-bit coordinate


def unpack_words(words) -> list:
    """List of NW int32 word tiles -> list of L limb tiles (tight, int32).

    Words carry raw LE bytes (bit pattern; int32 may be negative).
    Limb L-1 (bits 256..263) is zero for any canonical coordinate."""
    import jax

    zero = jnp.zeros_like(words[0])
    words_u = [jax.lax.bitcast_convert_type(w, jnp.uint32) for w in words]
    limbs = []
    for i in range(L - 1):
        w = words_u[i // 4]
        sh = 8 * (i % 4)
        limbs.append(((w >> sh) & jnp.uint32(0xFF)).astype(jnp.int32))
    limbs.append(zero)
    return limbs


def pack_words_host(limbs: np.ndarray) -> np.ndarray:
    """(L, n) tight host limbs -> (NW, n) int32 words (bit-pattern LE)."""
    assert limbs.shape[0] == L
    a = limbs.astype(np.uint32)
    out = np.zeros((NW, limbs.shape[1]), dtype=np.uint32)
    for w in range(NW):
        for k in range(4):
            out[w] |= a[4 * w + k] << np.uint32(8 * k)
    return out.view(np.int32)


def pack_words(limbs) -> list:
    """Device variant: list/array of L TIGHT limb tiles -> NW word tiles."""
    out = []
    for w in range(NW):
        acc = limbs[4 * w]
        for k in range(1, 4):
            acc = acc + (limbs[4 * w + k] << (8 * k))
        out.append(acc)
    return out


# --------------------------------------------------------------------------
# field bodies (all operate on lists of tiles; constants via `c` dict)
# --------------------------------------------------------------------------

def carry_round(a: list) -> list:
    his = [x >> B for x in a]
    out = [a[0] & MASK]
    for j in range(1, L):
        out.append((a[j] & MASK) + his[j - 1])
    out[L - 1] = out[L - 1] + (his[L - 1] << B)
    return out


def lazy_reduce(a: list, c: dict) -> list:
    """Map a lazy value (limbs possibly > 255, value < ~2^264) back into
    the lazy class: two carry rounds, fold the 2^256 overflow limb through
    c256 = 2^256 mod p, one more carry round (modops._lazy_reduce parity).
    """
    a = carry_round(carry_round(a))
    h = a[L - 1]
    out = []
    for j in range(L - 1):
        cj = c["c256"][j]
        out.append(a[j] + h * cj if cj else a[j])
    out.append(jnp.zeros_like(h))
    return carry_round(out)


def sub(a: list, b: list, c: dict) -> list:
    return lazy_reduce(
        [x + p - y for x, p, y in zip(a, c["pad"], b)], c)


def mm(a: list, b: list, c: dict) -> list:
    """CIOS Montgomery multiply; output limbs tight-ish (< 2^9)."""
    p = c["p"]
    pinv8 = c["pinv8"]
    acc = [None] * L
    for i in range(L):
        ai = a[i]
        if acc[0] is None:
            acc = [ai * bj for bj in b]
        else:
            acc = [t + ai * bj for t, bj in zip(acc, b)]
        m = ((acc[0] & MASK) * pinv8) & MASK
        acc = [t + m * pj if pj else t for t, pj in zip(acc, p)]
        carry = acc[0] >> B
        acc = acc[1:] + [jnp.zeros_like(ai)]
        acc[0] = acc[0] + carry
    for _ in range(3):
        acc = carry_round(acc)
    return acc


def is_zero(a: list, c: dict):
    """Exact zero test mod p of a lazy value (modops.is_zero parity):
    REDC by 1 maps the class below 2p, a full serial carry normalizes,
    then only 0 and p represent zero. Returns a bool tile."""
    one = [jnp.zeros_like(a[0]) for _ in range(L)]
    one[0] = one[0] + 1
    t = mm(lazy_reduce(a, c), one, c)
    carry = jnp.zeros_like(t[0])
    rows = []
    for i in range(L):
        v = t[i] + carry
        rows.append(v & MASK)
        carry = v >> B
    is0 = rows[0] == 0
    isp = rows[0] == c["p"][0]
    for i in range(1, L):
        is0 = is0 & (rows[i] == 0)
        isp = isp & (rows[i] == c["p"][i])
    return is0 | isp


def _zip3(f, p1, p2):
    return tuple(f(a, b) for a, b in zip(p1, p2))


def select(mask, t: list, f: list) -> list:
    return [jnp.where(mask, a, b) for a, b in zip(t, f)]


def madd(x1, y1, z1, x2, y2, c):
    """Mixed add: Jacobian (x1,y1,z1) + affine (x2,y2); no degenerate-case
    handling (msm_pallas._madd_body parity — callers select around)."""
    z1z1 = mm(z1, z1, c)
    u2 = mm(x2, z1z1, c)
    s2 = mm(y2, mm(z1, z1z1, c), c)
    h = sub(u2, x1, c)
    r = sub(s2, y1, c)
    hh = mm(h, h, c)
    hhh = mm(h, hh, c)
    v = mm(x1, hh, c)
    x3 = sub(sub(mm(r, r, c), hhh, c),
             lazy_reduce([t * 2 for t in v], c), c)
    y3 = sub(mm(r, sub(v, x3, c), c), mm(y1, hhh, c), c)
    z3 = mm(z1, h, c)
    return x3, y3, z3


def _inf_mask(z: list):
    m = z[0] == 0
    for t in z[1:]:
        m = m & (t == 0)
    return m


def jadd_unsafe(p1, p2, c):
    """General Jacobian add, infinity-aware (literal-zero Z), unsafe for
    P == +-Q (disjoint-subset operands only)."""
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    z1z1 = mm(z1, z1, c)
    z2z2 = mm(z2, z2, c)
    u1 = mm(x1, z2z2, c)
    u2 = mm(x2, z1z1, c)
    s1 = mm(y1, mm(z2, z2z2, c), c)
    s2 = mm(y2, mm(z1, z1z1, c), c)
    h = sub(u2, u1, c)
    r = sub(s2, s1, c)
    hh = mm(h, h, c)
    hhh = mm(h, hh, c)
    v = mm(u1, hh, c)
    x3 = sub(sub(mm(r, r, c), hhh, c),
             lazy_reduce([t * 2 for t in v], c), c)
    y3 = sub(mm(r, sub(v, x3, c), c), mm(s1, hhh, c), c)
    z3 = mm(mm(z1, z2, c), h, c)
    inf1 = _inf_mask(z1)
    inf2 = _inf_mask(z2)
    x3 = select(inf1, x2, select(inf2, x1, x3))
    y3 = select(inf1, y2, select(inf2, y1, y3))
    z3 = select(inf1, z2, select(inf2, z1, z3))
    return x3, y3, z3


def jdouble(p1, c):
    """Jacobian doubling (a=0 curves); correct at infinity and y=0."""
    x, y, z = p1
    a_ = mm(x, x, c)
    b_ = mm(y, y, c)
    c_ = mm(b_, b_, c)
    xb = lazy_reduce([u + v for u, v in zip(x, b_)], c)
    t = mm(xb, xb, c)
    d_ = lazy_reduce(
        [u * 2 for u in sub(sub(t, a_, c), c_, c)], c)
    e_ = lazy_reduce([u * 3 for u in a_], c)
    f_ = mm(e_, e_, c)
    x3 = sub(f_, lazy_reduce([u * 2 for u in d_], c), c)
    y3 = sub(mm(e_, sub(d_, x3, c), c),
             lazy_reduce([u * 8 for u in c_], c), c)
    z3 = mm(lazy_reduce([u * 2 for u in y], c), z, c)
    return x3, y3, z3


def jadd_complete(p1, p2, c):
    """Fully complete Jacobian add: resolves P==Q (double) and P==-Q
    (infinity) plus infinities (ops/ec.py add parity)."""
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    z1z1 = mm(z1, z1, c)
    z2z2 = mm(z2, z2, c)
    u1 = mm(x1, z2z2, c)
    u2 = mm(x2, z1z1, c)
    s1 = mm(y1, mm(z2, z2z2, c), c)
    s2 = mm(y2, mm(z1, z1z1, c), c)
    h = sub(u2, u1, c)
    r = sub(s2, s1, c)
    h_zero = is_zero(h, c)
    r_zero = is_zero(r, c)
    hh = mm(h, h, c)
    hhh = mm(h, hh, c)
    v = mm(u1, hh, c)
    x3 = sub(sub(mm(r, r, c), hhh, c),
             lazy_reduce([t * 2 for t in v], c), c)
    y3 = sub(mm(r, sub(v, x3, c), c), mm(s1, hhh, c), c)
    z3 = mm(mm(z1, z2, c), h, c)
    dx, dy, dz = jdouble(p1, c)
    inf1 = _inf_mask(z1)
    inf2 = _inf_mask(z2)
    finite = (~inf1) & (~inf2)
    same = h_zero & r_zero & finite
    opposite = h_zero & (~r_zero) & finite
    x3 = select(same, dx, x3)
    y3 = select(same, dy, y3)
    z3 = select(same, dz, z3)
    z3 = select(opposite, [jnp.zeros_like(t) for t in z3], z3)
    x3 = select(inf1, x2, x3)
    y3 = select(inf1, y2, y3)
    z3 = select(inf1, z2, z3)
    only2 = inf2 & ~inf1
    x3 = select(only2, x1, x3)
    y3 = select(only2, y1, y3)
    z3 = select(only2, z1, z3)
    return x3, y3, z3
