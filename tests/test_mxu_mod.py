"""Bit-exactness of the MXU montmul pipeline vs the host oracle and the
VPU CIOS montmul (ops/modops.py) — VERDICT r5 task 1's validation gate."""
import secrets

import numpy as np
import pytest

import jax.numpy as jnp

from webauthn_halo2_tpu.fields.limbs import FR_SPEC, FQ_SPEC, L
from webauthn_halo2_tpu.ops import modops as M
from webauthn_halo2_tpu.ops.mxu_mod import mxu_montmul


def _rand_mont(spec, n):
    ints = [secrets.randbelow(spec.p) for _ in range(n)]
    return ints, jnp.asarray(spec.encode(ints))


@pytest.mark.parametrize("spec", [FR_SPEC, FQ_SPEC], ids=["Fr", "Fq"])
def test_mxu_montmul_matches_oracle(spec):
    n = 64
    a_ints, a = _rand_mont(spec, n)
    b_ints, b = _rand_mont(spec, n)
    out = mxu_montmul(spec, a, b)
    got = spec.decode(np.asarray(out))
    want = [(x * y) % spec.p for x, y in zip(a_ints, b_ints)]
    assert got == want


def test_mxu_montmul_matches_vpu_montmul_mod_p():
    spec = FR_SPEC
    n = 32
    a_ints, a = _rand_mont(spec, n)
    b_ints, b = _rand_mont(spec, n)
    got = spec.decode(np.asarray(mxu_montmul(spec, a, b)))
    ref = spec.decode(np.asarray(M.montmul(spec, a, b)))
    assert got == ref


def test_mxu_montmul_lazy_inputs_and_output_discipline():
    """Inputs with limbs up to ~2^10 (sums of canonical values) must be
    handled; outputs must satisfy the lazy discipline (limbs <= 259,
    value < 2^260) so results chain into modops add/sub/montmul."""
    spec = FR_SPEC
    n = 16
    xs = [secrets.randbelow(spec.p) for _ in range(n)]
    ys = [secrets.randbelow(spec.p) for _ in range(n)]
    zs = [secrets.randbelow(spec.p) for _ in range(n)]
    ws = [secrets.randbelow(spec.p) for _ in range(n)]
    # lazy operands: limb-wise sums of 4 encodings (limbs <= 1020 < 2^11)
    a = (jnp.asarray(spec.encode(xs)) + jnp.asarray(spec.encode(ys))
         + jnp.asarray(spec.encode(zs)) + jnp.asarray(spec.encode(ws)))
    b_ints, b = _rand_mont(spec, n)
    out = np.asarray(mxu_montmul(spec, a, b))
    got = spec.decode(out)
    want = [((x + y + z + w) * bv) % spec.p
            for x, y, z, w, bv in zip(xs, ys, zs, ws, b_ints)]
    assert got == want
    assert out.min() >= 0 and out.max() <= 259
    from webauthn_halo2_tpu.fields.limbs import limbs_to_ints

    vals = limbs_to_ints(out)
    assert max(vals) < 1 << 260


def test_mxu_montmul_chains_with_itself():
    """(a*b)*c through two chained mxu_montmuls (output feeds input)."""
    spec = FR_SPEC
    n = 16
    a_ints, a = _rand_mont(spec, n)
    b_ints, b = _rand_mont(spec, n)
    c_ints, c = _rand_mont(spec, n)
    ab = mxu_montmul(spec, a, b)
    abc = mxu_montmul(spec, ab, c)
    got = spec.decode(np.asarray(abc))
    want = [(x * y * z) % spec.p for x, y, z in zip(a_ints, b_ints, c_ints)]
    assert got == want


def test_mxu_montmul_rows_pallas_matches():
    """Fused-Pallas rows kernel (interpret on CPU) == XLA pipeline."""
    from webauthn_halo2_tpu.ops.mxu_mod import mxu_montmul_rows

    spec = FR_SPEC
    n = 256
    a_ints, a = _rand_mont(spec, n)
    b_ints, b = _rand_mont(spec, n)
    out = mxu_montmul_rows(spec, a.T, b.T, block=128)
    got = spec.decode(np.asarray(out).T)
    want = [(x * y) % spec.p for x, y in zip(a_ints, b_ints)]
    assert got == want
