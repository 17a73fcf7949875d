"""WebAuthn client fixture tests (L7, SURVEY §3.4): registration/assertion
parsing, msghash construction, byte conventions, and the path from
WebAuthn-shaped input into the ECDSA circuit."""
import pytest

from webauthn_halo2_tpu.client import webauthn as wa
from webauthn_halo2_tpu.api import le_bytes_to_int


def test_registration_roundtrip():
    """Registration authenticatorData parses back to the same COSE key
    (parseAuthenticatorData parity, index.tsx:67-131)."""
    cred = wa.create_credential("example.com")
    data = wa.registration_authenticator_data(cred)
    parsed = wa.parse_authenticator_data(data)
    import hashlib

    assert parsed["rpIdHash"] == hashlib.sha256(b"example.com").digest()
    assert parsed["flags"] & wa.FLAG_AT
    assert parsed["credentialId"] == cred.credential_id
    assert parsed["publicKey"] == cred.pk
    assert parsed["credentialPublicKey"][3] == -7  # alg ES256


def test_assertion_msghash_and_signature():
    """msghash = SHA256(authData || SHA256(clientDataJSON))
    (index.tsx:186-197) and the DER->raw signature path verify against
    the host ECDSA oracle (the demo's WebCrypto check, index.tsx:263-269)."""
    import hashlib

    cred = wa.create_credential()
    assertion = wa.authenticate(cred, b"fight me", origin="https://x.y")
    inner = hashlib.sha256(assertion.client_data_json).digest()
    expect = int.from_bytes(
        hashlib.sha256(assertion.authenticator_data + inner).digest(), "big"
    ) % wa.P256_N
    assert assertion.msghash == expect
    assert wa.der_parse_signature(assertion.der_signature) == \
        (assertion.r, assertion.s)
    assert wa.verify_assertion_host(assertion, cred)
    # tampered clientData -> different msghash -> invalid signature
    bad = wa.Assertion(assertion.authenticator_data,
                       assertion.client_data_json + b" ",
                       assertion.der_signature, (assertion.msghash + 1)
                       % wa.P256_N, assertion.r, assertion.s)
    assert not wa.verify_assertion_host(bad, cred)


def test_der_leading_zero_stripping():
    """index.tsx:237-250: authenticators emit DER with a zero pad byte when
    the high bit is set; the raw form strips it."""
    r = 0x80 << 248  # high bit set -> DER pads
    s = 0x7F
    der = wa.der_encode_signature(r, s)
    assert der[4] == 0x00  # pad byte present in DER
    assert wa.der_parse_signature(der) == (r, s)


def test_prove_request_le_convention():
    """index.tsx:287-294: every 32-byte input byte-reversed to LE — must
    round-trip through the server's decoder (le_bytes_to_int,
    Fp::from_bytes parity ecdsa_p256.rs:346-352)."""
    cred = wa.create_credential()
    assertion = wa.authenticate(cred, b"challenge")
    body = wa.prove_request_body(assertion, cred)
    assert le_bytes_to_int(body["r"]) == assertion.r
    assert le_bytes_to_int(body["s"]) == assertion.s
    assert le_bytes_to_int(body["msghash"]) == assertion.msghash
    assert le_bytes_to_int(body["pubkey_x"]) == cred.pk[0]
    assert le_bytes_to_int(body["pubkey_y"]) == cred.pk[1]
    # and they're the BE-byte reversal of the on-wire hex the demo shows
    assert bytes(body["r"]) == assertion.r.to_bytes(32, "big")[::-1]


@pytest.mark.slow
def test_webauthn_to_circuit_mock_proof():
    """WebAuthn-shaped input all the way into the k=17 ECDSA circuit:
    witness generation + MockProver acceptance (the first e2e correctness
    gate, SURVEY §7.2 step 3)."""
    from webauthn_halo2_tpu.circuits.ecdsa_circuit import (
        CircuitParams, ECDSACircuit, ECDSAInputs)
    from webauthn_halo2_tpu.plonk.mock import mock_prove

    cred = wa.create_credential()
    assertion = wa.authenticate(cred, b"mock-me")
    body = wa.prove_request_body(assertion, cred)
    inputs = ECDSAInputs(
        r=le_bytes_to_int(body["r"]), s=le_bytes_to_int(body["s"]),
        msghash=le_bytes_to_int(body["msghash"]),
        pk=(le_bytes_to_int(body["pubkey_x"]),
            le_bytes_to_int(body["pubkey_y"])),
    )
    params = CircuitParams()
    circuit = ECDSACircuit(params)
    cs, fixed, _a, copies = circuit.build(ECDSAInputs.dummy())
    advice = circuit.witness(inputs)
    assert mock_prove(cs, params.degree, fixed, advice, copies=copies) == []


def test_webauthn_assertion_to_es256_inputs():
    """The assertion maps losslessly onto the ES256 circuit's witness
    model: circuit msghash == client msghash (mod n)."""
    cred = wa.create_credential()
    assertion = wa.authenticate(cred, b"es256-bridge")
    inputs = wa.es256_inputs_from_assertion(assertion, cred)
    assert len(inputs.authenticator_data) == 37
    assert inputs.msghash % wa.P256_N == assertion.msghash
    assert (inputs.r, inputs.s) == (assertion.r, assertion.s)


@pytest.mark.slow
def test_webauthn_assertion_es256_mock_proof():
    """Full WebAuthn->ES256 circuit: in-circuit SHA-256 of the real
    assertion bytes + ECDSA verify, MockProver-accepted."""
    from webauthn_halo2_tpu.circuits.es256_circuit import ES256Circuit
    from webauthn_halo2_tpu.plonk.mock import mock_prove

    cred = wa.create_credential()
    assertion = wa.authenticate(cred, b"es256-mock")
    inputs = wa.es256_inputs_from_assertion(assertion, cred)
    circ = ES256Circuit()
    cs, fixed, advice, copies = circ.build(inputs)
    assert mock_prove(cs, circ.params.degree, fixed, advice,
                      copies=copies) == []
