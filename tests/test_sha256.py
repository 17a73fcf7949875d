"""SHA-256 gadget: witness values vs hashlib; constraint check via mock."""
import hashlib
import secrets

import pytest

from webauthn_halo2_tpu.circuits.builder import CircuitBuilder
from webauthn_halo2_tpu.circuits.sha256 import Sha256Chip
from webauthn_halo2_tpu.plonk.mock import mock_prove


def _run_chip(msg: bytes):
    b = CircuitBuilder(num_advice=4, num_lookup_advice=1, lookup_bits=16)
    sha = Sha256Chip(b)
    cells = b.load_witnesses(list(msg))
    for c in cells:
        b.range_check(c, 8)
    digest = sha.sha256(cells, len(msg))
    return b, bytes(c.value for c in digest)


def test_sha256_witness_matches_hashlib():
    for msg in (b"", b"abc", secrets.token_bytes(55), secrets.token_bytes(69)):
        _b, got = _run_chip(msg)
        assert got == hashlib.sha256(msg).digest(), msg


def test_sha256_constraints_satisfied():
    """Full mock-prove at k=17 (the pair tables need 2^16 rows)."""
    msg = secrets.token_bytes(69)  # the ES256 message length
    b, got = _run_chip(msg)
    assert got == hashlib.sha256(msg).digest()
    cs, fixed, advice, copies = b.finalize(17)
    assert mock_prove(cs, 17, fixed, advice, copies=copies) == []
