"""Transcript unit tests: roundtrips, point compression, determinism."""
import secrets

from webauthn_halo2_tpu.fields.constants import BN254_FR
from webauthn_halo2_tpu.fields.ref_curve import BN254_G1_CURVE
from webauthn_halo2_tpu.plonk.transcript import (
    Blake2bRead,
    Blake2bWrite,
    KeccakRead,
    KeccakWrite,
    compress_g1,
    decompress_g1,
)


def test_point_compression_roundtrip():
    for _ in range(8):
        pt = BN254_G1_CURVE.random_point()
        assert decompress_g1(compress_g1(pt)) == pt
    assert decompress_g1(compress_g1(None)) is None


def test_blake2b_roundtrip_and_determinism():
    pts = [BN254_G1_CURVE.random_point() for _ in range(3)]
    scalars = [secrets.randbelow(BN254_FR) for _ in range(3)]

    def run_writer():
        t = Blake2bWrite()
        chals = []
        for p, s in zip(pts, scalars):
            t.write_point(p)
            chals.append(t.squeeze_challenge())
            t.write_scalar(s)
        chals.append(t.squeeze_challenge())
        return t.finalize(), chals

    proof, chals = run_writer()
    proof2, chals2 = run_writer()
    assert proof == proof2 and chals == chals2  # deterministic

    r = Blake2bRead(proof)
    rchals = []
    for p, s in zip(pts, scalars):
        assert r.read_point() == p
        rchals.append(r.squeeze_challenge())
        assert r.read_scalar() == s
    rchals.append(r.squeeze_challenge())
    r.assert_consumed()
    assert rchals == chals  # verifier re-derives identical challenges

    # consecutive squeezes differ (prefix byte re-absorbed)
    t = Blake2bWrite()
    t.write_scalar(1)
    assert t.squeeze_challenge() != t.squeeze_challenge()


def test_keccak_roundtrip():
    pts = [BN254_G1_CURVE.random_point() for _ in range(2)]
    t = KeccakWrite()
    t.write_point(pts[0])
    c1 = t.squeeze_challenge()
    t.write_scalar(42)
    t.write_point(pts[1])
    c2 = t.squeeze_challenge()
    proof = t.finalize()
    assert len(proof) == 64 + 32 + 64  # uncompressed points, BE scalars

    r = KeccakRead(proof)
    assert r.read_point() == pts[0]
    assert r.squeeze_challenge() == c1
    assert r.read_scalar() == 42
    assert r.read_point() == pts[1]
    assert r.squeeze_challenge() == c2
    r.assert_consumed()


def test_non_canonical_rejected():
    import pytest

    # scalar >= r must be rejected
    bad = (BN254_FR + 1).to_bytes(32, "little")
    r = Blake2bRead(bytes(bad))
    with pytest.raises(ValueError):
        r.read_scalar()
    # x not on curve (about half of all x are non-residues; find one)
    from webauthn_halo2_tpu.fields.constants import BN254_FQ
    from webauthn_halo2_tpu.fields.ref_field import sqrt_mod

    x = next(
        x for x in range(2, 100)
        if sqrt_mod((x * x * x + 3) % BN254_FQ, BN254_FQ) is None
    )
    with pytest.raises(ValueError):
        decompress_g1(x.to_bytes(32, "little"))
