"""ctypes binding to the native bn254 pairing/MSM library (libwh2pair.so).

Brings the host verifier's cold path into the reference's class (native
verify is ~3.7 ms at k=17 — ecdsa_bench.csv:4); the pure-Python tower in
`fields.pairing` stays as hermetic fallback and correctness oracle.
Points cross the boundary as plain (non-Montgomery) little-endian 4x64
limbs; infinity is the all-zero sentinel on input and output.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_NATIVE_DIR, "libwh2pair.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "libwh2pair.so"], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            _LIB = False
            return False
    try:
        lib = ctypes.CDLL(so)
        lib.wh2_g1_msm.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.wh2_g1_msm.restype = ctypes.c_int
        lib.wh2_pairing_check.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint64,
        ]
        lib.wh2_pairing_check.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = False
    return _LIB


def available() -> bool:
    return bool(_load())


def _limbs4(x: int, buf, off):
    for i in range(4):
        buf[off + i] = (x >> (64 * i)) & 0xFFFFFFFFFFFFFFFF


def pairing_check(pairs) -> bool | None:
    """prod e(P_i, Q_i) == 1. pairs = [(G1 | None, G2)], with
    G1 = (x, y) ints and G2 = ((x0, x1), (y0, y1)) ints.
    Returns None when the native library is unavailable."""
    lib = _load()
    if not lib:
        return None
    live = [(p, q) for p, q in pairs if p is not None]
    n = len(live)
    g1 = (ctypes.c_uint64 * (8 * n))()
    g2 = (ctypes.c_uint64 * (16 * n))()
    for i, (p, q) in enumerate(live):
        _limbs4(p[0], g1, 8 * i)
        _limbs4(p[1], g1, 8 * i + 4)
        (x0, x1), (y0, y1) = q
        _limbs4(x0, g2, 16 * i)
        _limbs4(x1, g2, 16 * i + 4)
        _limbs4(y0, g2, 16 * i + 8)
        _limbs4(y1, g2, 16 * i + 12)
    rc = lib.wh2_pairing_check(g1, g2, n)
    if rc < 0:
        return None
    return bool(rc)


def g1_msm(pairs) -> tuple | None:
    """sum s_i * P_i over G1. pairs = [(P | None, scalar int)].
    Returns affine (x, y) ints, None for the point at infinity, or the
    string "unavailable" is never used — raises nothing; when the lib is
    missing returns the sentinel NotImplemented so callers can fall back."""
    lib = _load()
    if not lib:
        return NotImplemented
    live = [(p, s) for p, s in pairs if p is not None and s]
    n = len(live)
    if n == 0:
        return None
    sc = (ctypes.c_uint64 * (4 * n))()
    pts = (ctypes.c_uint64 * (8 * n))()
    for i, (p, s) in enumerate(live):
        _limbs4(s, sc, 4 * i)
        _limbs4(p[0], pts, 8 * i)
        _limbs4(p[1], pts, 8 * i + 4)
    out = (ctypes.c_uint64 * 8)()
    lib.wh2_g1_msm(sc, pts, n, out)
    x = sum(out[i] << (64 * i) for i in range(4))
    y = sum(out[4 + i] << (64 * i) for i in range(4))
    if x == 0 and y == 0:
        return None
    return (x, y)
