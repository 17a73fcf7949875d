"""ops/limbvec (list-form kernel field bodies) vs the ops/modops oracle.

Pure-jnp correctness on CPU: the same bodies run unchanged inside the v2
Pallas kernels, so agreement here + the kernel-level cross-checks in
tests/test_msm_pallas_v2.py covers the v2 hot path."""
import secrets

import jax.numpy as jnp
import numpy as np
import pytest

from webauthn_halo2_tpu.fields.limbs import FQ_SPEC, L, ints_to_limbs_fast
from webauthn_halo2_tpu.ops import limbvec as V
from webauthn_halo2_tpu.ops import modops as M

SPEC = FQ_SPEC
P = SPEC.p
N = 32


def to_list(arr):
    return [jnp.asarray(arr[i]) for i in range(L)]


def from_list(lst):
    return jnp.stack(lst)


def rand_mont(n=N):
    vals = [secrets.randbelow(P) for _ in range(n)]
    return jnp.asarray(SPEC.encode(vals)), vals


def decode(lst):
    arr = np.asarray(M.normalize(SPEC, M.from_mont(SPEC, from_list(lst))))
    from webauthn_halo2_tpu.fields.limbs import limbs_to_ints_fast

    return limbs_to_ints_fast(arr)


def test_mm_matches_montmul():
    a, av = rand_mont()
    b, bv = rand_mont()
    c = V.spec_consts(SPEC)
    got = from_list(V.mm(to_list(a), to_list(b), c))
    want = M.montmul(SPEC, a, b)
    ga = np.asarray(M.normalize(SPEC, got))
    wa = np.asarray(M.normalize(SPEC, want))
    assert (ga == wa).all()


def test_sub_and_lazy_reduce():
    a, _ = rand_mont()
    b, _ = rand_mont()
    c = V.spec_consts(SPEC)
    got = from_list(V.sub(to_list(a), to_list(b), c))
    want = M.sub(SPEC, a, b)
    assert (np.asarray(M.normalize(SPEC, got))
            == np.asarray(M.normalize(SPEC, want))).all()


def test_is_zero():
    c = V.spec_consts(SPEC)
    a, _ = rand_mont()
    nz = np.asarray(V.is_zero(to_list(a), c))
    assert not nz.any()
    zero = [jnp.zeros((N,), jnp.int32) for _ in range(L)]
    assert np.asarray(V.is_zero(zero, c)).all()
    # p itself represents zero
    p_limbs = ints_to_limbs_fast([P] * N)
    assert np.asarray(V.is_zero(to_list(jnp.asarray(p_limbs)), c)).all()


def test_unpack_pack_roundtrip():
    a, vals = rand_mont()
    tight = np.asarray(M.normalize(SPEC, a))
    words_host = V.pack_words_host(tight)
    limbs = V.unpack_words([jnp.asarray(words_host[w]) for w in range(V.NW)])
    assert (np.asarray(from_list(limbs)) == tight).all()
    # device pack matches host pack
    dev_words = V.pack_words(to_list(jnp.asarray(tight)))
    assert (np.asarray(jnp.stack(dev_words)) == words_host).all()


def _ec_points(n=N):
    """Random curve points (host) as Montgomery limb lists + ints."""
    from webauthn_halo2_tpu.fields.ref_curve import BN254_G1_CURVE as HC
    from webauthn_halo2_tpu.ops.ec import BN254_CURVE, JPoint  # noqa: F401

    pts = []
    g = HC.g
    acc = g
    for _ in range(n):
        pts.append(acc)
        acc = HC.add(acc, g)
    xs = jnp.asarray(SPEC.encode([p[0] for p in pts]))
    ys = jnp.asarray(SPEC.encode([p[1] for p in pts]))
    return pts, xs, ys


def test_madd_vs_host():
    from webauthn_halo2_tpu.fields.ref_curve import BN254_G1_CURVE as HC

    c = V.spec_consts(SPEC)
    pts, xs, ys = _ec_points()
    # jacobian accumulator = 2*P (z=1 start, then double via jdouble)
    one = [jnp.full((N,), v, jnp.int32) for v in
           np.asarray(SPEC.one_mont)]
    acc = ( to_list(xs), to_list(ys), one )
    dx, dy, dz = V.jdouble(acc, c)
    # add the affine point: 2P + P = 3P
    x3, y3, z3 = V.madd(dx, dy, dz, to_list(xs), to_list(ys), c)
    # normalize via host: affine = (x/z^2, y/z^3)
    xi = decode(x3)
    yi = decode(y3)
    zi = decode(z3)
    for j in range(N):
        want = HC.mul(3, pts[j])
        zinv = pow(zi[j], P - 2, P)
        ax = xi[j] * zinv * zinv % P
        ay = yi[j] * zinv * zinv * zinv % P
        assert (ax, ay) == want


def test_jadd_unsafe_and_complete():
    from webauthn_halo2_tpu.fields.ref_curve import BN254_G1_CURVE as HC

    c = V.spec_consts(SPEC)
    pts, xs, ys = _ec_points()
    one = [jnp.full((N,), v, jnp.int32) for v in np.asarray(SPEC.one_mont)]
    zero = [jnp.zeros((N,), jnp.int32) for _ in range(L)]
    p1 = (to_list(xs), to_list(ys), one)
    # P + 2P via unsafe (distinct points)
    d2 = V.jdouble(p1, c)
    s_un = V.jadd_unsafe(d2, p1, c)
    s_co = V.jadd_complete(d2, p1, c)
    # complete also handles P + P (doubling branch)
    s_dbl = V.jadd_complete(p1, p1, c)
    # and P + (-P) -> infinity
    neg_y = [jnp.asarray(v) for v in np.asarray(M.sub(
        SPEC, jnp.zeros_like(ys), ys))]
    s_inf = V.jadd_complete(p1, (to_list(xs), neg_y, one), c)
    zi = np.asarray(from_list(s_inf[2]))
    # infinity encoded as z == 0 exactly mod p
    from_inf = decode(s_inf[2])
    assert all(v == 0 for v in from_inf)
    # infinities propagate
    pinf = (one, one, zero)
    s_id = V.jadd_complete(pinf, p1, c)
    assert decode(s_id[0]) == decode(p1[0])

    def aff(s):
        xi, yi, zi = decode(s[0]), decode(s[1]), decode(s[2])
        out = []
        for j in range(N):
            zinv = pow(zi[j], P - 2, P)
            out.append((xi[j] * zinv * zinv % P,
                        yi[j] * zinv * zinv * zinv % P))
        return out

    want3 = [HC.mul(3, p) for p in pts]
    assert aff(s_un) == want3
    assert aff(s_co) == want3
    assert aff(s_dbl) == [HC.mul(2, p) for p in pts]
