"""Device limb arithmetic vs the Python-int oracle."""
import secrets

import jax.numpy as jnp
import numpy as np
import pytest

from webauthn_halo2_tpu.fields.limbs import FQ_SPEC, FR_SPEC, ints_to_limbs
from webauthn_halo2_tpu.ops import modops as M

SPECS = [FR_SPEC, FQ_SPEC]


def rand_ints(spec, n):
    return [secrets.randbelow(spec.p) for _ in range(n)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mont_roundtrip(spec):
    xs = rand_ints(spec, 8) + [0, 1, spec.p - 1]
    a = jnp.asarray(spec.encode(xs))
    back = spec.decode(np.asarray(a))
    assert back == [x % spec.p for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_montmul_add_sub(spec):
    n = 16
    xs, ys = rand_ints(spec, n), rand_ints(spec, n)
    a = jnp.asarray(spec.encode(xs))
    b = jnp.asarray(spec.encode(ys))

    prod = M.montmul(spec, a, b)
    assert spec.decode(np.asarray(prod)) == [x * y % spec.p for x, y in zip(xs, ys)]

    s = M.add(spec, a, b)
    assert spec.decode(np.asarray(s)) == [(x + y) % spec.p for x, y in zip(xs, ys)]

    d = M.sub(spec, a, b)
    assert spec.decode(np.asarray(d)) == [(x - y) % spec.p for x, y in zip(xs, ys)]

    ng = M.neg(spec, a)
    assert spec.decode(np.asarray(ng)) == [(-x) % spec.p for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_lazy_chains(spec):
    """Chains of adds between reductions stay correct (bound discipline)."""
    n = 8
    xs = rand_ints(spec, n)
    a = jnp.asarray(spec.encode(xs))
    acc = a
    for _ in range(3):  # 4 terms summed raw, then reduced through montmul
        acc = acc + a
    sq = M.montmul(spec, acc, acc)
    expect = [(4 * x) * (4 * x) % spec.p for x in xs]
    assert spec.decode(np.asarray(sq)) == expect


def test_pow_inv_zero_eq():
    spec = FR_SPEC
    xs = rand_ints(spec, 4)
    a = jnp.asarray(spec.encode(xs))

    p5 = M.pow_const(spec, a, 5)
    assert spec.decode(np.asarray(p5)) == [pow(x, 5, spec.p) for x in xs]

    inv = M.inv_fermat(spec, a)
    assert spec.decode(np.asarray(inv)) == [pow(x, -1, spec.p) for x in xs]

    z = jnp.asarray(spec.encode([0, 1, spec.p - 1, 0]))
    assert list(np.asarray(M.is_zero(spec, z))) == [True, False, False, True]

    b = jnp.asarray(spec.encode(xs))
    assert bool(np.all(np.asarray(M.eq(spec, a, b))))


def test_batch_inverse():
    spec = FR_SPEC
    xs = rand_ints(spec, 31) + [0]
    a = jnp.asarray(spec.encode(xs))
    inv = M.batch_inverse(spec, a, axis=1)
    got = spec.decode(np.asarray(inv))
    expect = [pow(x, -1, spec.p) if x else 0 for x in xs]
    assert got == expect


def test_normalize_standard_form():
    spec = FR_SPEC
    xs = rand_ints(spec, 4)
    # build deliberately lazy values: sum of 10 copies (value ~ 10x)
    raw = ints_to_limbs([x for x in xs])
    a = jnp.asarray(np.tile(raw, (1, 1)))
    lazy = a
    for _ in range(9):
        lazy = M.add(spec, lazy, a)
    norm = M.normalize(spec, lazy)
    vals = [v % spec.p for v in
            [sum(int(np.asarray(norm)[i, j]) << (8 * i) for i in range(33))
             for j in range(len(xs))]]
    assert vals == [10 * x % spec.p for x in xs]
    # limbs tight and value < p
    arr = np.asarray(norm)
    assert arr.min() >= 0 and arr[:32].max() <= 255
    for j, x in enumerate(xs):
        v = sum(int(arr[i, j]) << (8 * i) for i in range(33))
        assert v == 10 * x % spec.p


def test_montmul_loop_mode_matches_unrolled():
    """WH2_MONTMUL_LOOP=1 (rolled CIOS for the CPU dryrun's compile
    budget) must be bit-identical to the unrolled form."""
    import os
    import secrets

    import jax
    import numpy as np
    import jax.numpy as jnp

    from webauthn_halo2_tpu.fields.limbs import FR_SPEC
    from webauthn_halo2_tpu.ops import modops as M

    a_ints = [secrets.randbelow(FR_SPEC.p) for _ in range(8)]
    b_ints = [secrets.randbelow(FR_SPEC.p) for _ in range(8)]
    a = jnp.asarray(FR_SPEC.encode(a_ints))
    b = jnp.asarray(FR_SPEC.encode(b_ints))
    looped_env = os.environ.get("WH2_MONTMUL_LOOP")
    os.environ["WH2_MONTMUL_LOOP"] = "1"
    try:
        base = np.asarray(M.montmul(FR_SPEC, a, b))
        # separate trace of the UNROLLED form (fresh wrapper: the same
        # jit signature would reuse the first executable)
        os.environ.pop("WH2_MONTMUL_LOOP", None)
        unrolled = np.asarray(jax.jit(
            lambda x, y: M.montmul.__wrapped__(FR_SPEC, x, y))(a, b))
    finally:
        if looped_env is not None:
            os.environ["WH2_MONTMUL_LOOP"] = looped_env
    assert (base == unrolled).all()
