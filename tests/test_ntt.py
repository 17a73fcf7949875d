"""NTT vs naive host evaluation; roundtrip; coset shift."""
import secrets

import jax.numpy as jnp
import numpy as np

from webauthn_halo2_tpu.fields.constants import BN254_FR, BN254_FR_GENERATOR
from webauthn_halo2_tpu.fields.limbs import FR_SPEC
from webauthn_halo2_tpu.ops import ntt as N


def naive_eval(coeffs, points, p):
    out = []
    for x in points:
        acc, xp = 0, 1
        for c in coeffs:
            acc = (acc + c * xp) % p
            xp = xp * x % p
        out.append(acc)
    return out


def test_ntt_matches_naive():
    k, p = 4, BN254_FR
    n = 1 << k
    coeffs = [secrets.randbelow(p) for _ in range(n)]
    a = jnp.asarray(FR_SPEC.encode(coeffs))
    evals = FR_SPEC.decode(np.asarray(N.ntt(FR_SPEC, a, k)))
    w = N.root_of_unity(k)
    points = [pow(w, i, p) for i in range(n)]
    assert evals == naive_eval(coeffs, points, p)


def test_ntt_roundtrip():
    k = 6
    n = 1 << k
    coeffs = [secrets.randbelow(BN254_FR) for _ in range(n)]
    a = jnp.asarray(FR_SPEC.encode(coeffs))
    back = FR_SPEC.decode(np.asarray(N.intt(FR_SPEC, N.ntt(FR_SPEC, a, k), k)))
    assert back == coeffs


def test_coset_eval():
    k, p = 3, BN254_FR
    n = 1 << k
    g = BN254_FR_GENERATOR
    coeffs = [secrets.randbelow(p) for _ in range(n)]
    a = jnp.asarray(FR_SPEC.encode(coeffs))
    shifted = N.coset_shift(FR_SPEC, a, g)
    evals = FR_SPEC.decode(np.asarray(N.ntt(FR_SPEC, shifted, k)))
    w = N.root_of_unity(k)
    points = [g * pow(w, i, p) % p for i in range(n)]
    assert evals == naive_eval(coeffs, points, p)
