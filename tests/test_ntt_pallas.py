"""Fused Pallas NTT (ops/ntt_pallas) vs the XLA reference (ops/ntt).

Small sizes in interpret mode; t_lanes=16 forces the cross-block
kernel-B path that production k=17..20 sizes exercise."""
import secrets

import jax.numpy as jnp
import numpy as np
import pytest

from webauthn_halo2_tpu.fields.limbs import FR_SPEC
from webauthn_halo2_tpu.ops import ntt as N
from webauthn_halo2_tpu.ops import ntt_pallas as NP

K = 6
N_ = 1 << K


@pytest.fixture(scope="module")
def coeffs():
    vals = [secrets.randbelow(FR_SPEC.p) for _ in range(N_)]
    return jnp.asarray(FR_SPEC.encode(vals))


def _dec(x):
    return FR_SPEC.decode(np.asarray(x))


def test_forward_local_only(coeffs):
    got = NP.ntt_fused(FR_SPEC, coeffs, K, False)
    assert _dec(got) == _dec(N.ntt(FR_SPEC, coeffs, K))


def test_forward_and_inverse_cross_block(coeffs):
    got_f = NP.ntt_fused(FR_SPEC, coeffs, K, False, 16)
    assert _dec(got_f) == _dec(N.ntt(FR_SPEC, coeffs, K))
    got_i = NP.ntt_fused(FR_SPEC, coeffs, K, True, 16)
    assert _dec(got_i) == _dec(N.intt(FR_SPEC, coeffs, K))


@pytest.mark.slow
def test_batched(coeffs):
    b = jnp.stack([coeffs, coeffs[:, ::-1]])
    got = NP.ntt_fused(FR_SPEC, b, K, False, 16)
    assert _dec(got[0]) == _dec(N.ntt(FR_SPEC, b[0], K))
    assert _dec(got[1]) == _dec(N.ntt(FR_SPEC, b[1], K))
