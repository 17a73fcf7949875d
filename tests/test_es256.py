"""ES256/WebAuthn circuit: SHA-256 + ECDSA composition."""
import secrets

import pytest

from webauthn_halo2_tpu.circuits.es256_circuit import (
    AUTH_DATA_LEN,
    ES256Circuit,
    ES256Inputs,
)
from webauthn_halo2_tpu.fields.ref_curve import ecdsa_keygen, ecdsa_sign
from webauthn_halo2_tpu.plonk.mock import mock_prove


def fresh_inputs() -> ES256Inputs:
    auth = secrets.token_bytes(AUTH_DATA_LEN)
    cdh = secrets.token_bytes(32)
    sk, pk = ecdsa_keygen()
    import hashlib

    m = int.from_bytes(hashlib.sha256(auth + cdh).digest(), "big")
    r, s = ecdsa_sign(m, sk)
    return ES256Inputs(r, s, auth, cdh, pk)


def test_es256_synthesis_and_rejection():
    """Synthesis succeeds on a valid witness; fails on a bad signature."""
    circ = ES256Circuit()
    inputs = fresh_inputs()
    cs, fixed, advice, copies = circ.build(inputs)
    assert cs.num_advice > 0 and sum(len(c) for c in advice) > 0

    bad = ES256Inputs(inputs.r, (inputs.s + 1) % (1 << 255),
                      inputs.authenticator_data, inputs.client_data_hash,
                      inputs.pk)
    with pytest.raises(Exception):
        circ.build(bad)


def test_es256_mock_proves():
    circ = ES256Circuit()
    cs, fixed, advice, copies = circ.build(fresh_inputs())
    assert mock_prove(cs, circ.params.degree, fixed, advice, copies=copies) == []
