"""WH2_QUOTIENT_CHUNKS: the lax.map-windowed quotient evaluation must be
bit-identical to the default full-width graph.

The chunked mode exists for memory: per-constraint int32 temps shrink
chunks-fold and int16 residents upcast per-window (the 15-advice ES256
stack at k=17 OOMed a 16 GB chip through the full-width path —
results/ROUND5.md §4). Every rotation class is exercised here: gate
rotations (+1), permutation z recursion (rot=usable), chunk boundary
(rot=1), and lookup shuffle (rot=+1/-1)."""
import os

import numpy as np
import pytest

from webauthn_halo2_tpu.fields.constants import BN254_FR
from webauthn_halo2_tpu.plonk import cs as CS
from webauthn_halo2_tpu.plonk.keygen import keygen
from webauthn_halo2_tpu.plonk.prover import create_proof
from webauthn_halo2_tpu.plonk.srs import get_srs
from webauthn_halo2_tpu.plonk.verifier import verify_proof

K = 6


def _det_rng():
    state = [0]

    def rng(nbytes):
        state[0] += 1
        seed = np.random.default_rng(state[0]).integers(
            0, 256, size=nbytes, dtype=np.uint8)
        return bytes(seed.tolist())

    return rng


@pytest.fixture(scope="module")
def toy_pk():
    cs = CS.ConstraintSystem(num_fixed=1, num_advice=2)
    q = CS.fixed(0)
    # gate with a rotation so col_getter_ext sees rot != 0
    cs.gate("g", q * (CS.advice(0) + CS.advice(0, 1) * CS.advice(1)
                      - CS.advice(0, 1)))
    cs.enable_permutation(CS.ADVICE, 0)
    cs.enable_permutation(CS.ADVICE, 1)
    # one lookup: advice col 1 values must appear in the fixed table
    cs.lookup("lk", [CS.advice(1)], [CS.fixed(0)])
    usable = cs.usable_rows(1 << K)
    a0 = [0, 1, 1, 0] + [0] * (usable - 4)
    a1 = [1, 1, 0, 1] + [0] * (usable - 4)
    qcol = [1, 0] + [0] * ((1 << K) - 2)
    copies = [((CS.ADVICE, 0, 0), (CS.ADVICE, 0, 3))]
    srs = get_srs(K)
    pk = keygen(srs, cs, [qcol], copies)
    return srs, pk, [a0, a1]


def test_chunked_quotient_bit_identical(toy_pk):
    srs, pk, advice = toy_pk
    base = create_proof(pk, advice, [], rng=_det_rng())
    assert verify_proof(pk.vk, srs, base, [])
    os.environ["WH2_QUOTIENT_CHUNKS"] = "4"
    try:
        chunked = create_proof(pk, advice, [], rng=_det_rng())
    finally:
        del os.environ["WH2_QUOTIENT_CHUNKS"]
    assert chunked == base, "chunked quotient diverged from the default graph"
