"""Proving-server tests (L4): HTTP plumbing fast; full WebAuthn->proof
e2e in the slow tier (the reference's browser flow, SURVEY §3.4)."""
import json
import threading
import urllib.request

import pytest

from webauthn_halo2_tpu.client import webauthn as wa
from webauthn_halo2_tpu.server import app as server_app


@pytest.fixture()
def http_server():
    srv = server_app.ThreadingHTTPServer(("127.0.0.1", 0),
                                         server_app.Handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(base: str, route: str, body: dict) -> tuple[int, str]:
    req = urllib.request.Request(
        base + route, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_routes_and_schemas(http_server, monkeypatch):
    """All six routes respond with the reference's schemas (main.rs:29-439);
    proving is stubbed so this validates HTTP+JSON plumbing fast."""
    from webauthn_halo2_tpu.server import app

    calls = {}

    def fake_prove(r, s, px, py, mh, proving_key_path="", **kw):
        calls["prove"] = (bytes(r), bytes(s), bytes(px), bytes(py), bytes(mh))
        return b"\xab" * 8

    monkeypatch.setattr(app.api, "generate_proof", fake_prove)
    monkeypatch.setattr(app.api, "generate_proof_evm", fake_prove)
    monkeypatch.setattr(app.api, "verify",
                        lambda proof, *a, **k: proof == b"\xab" * 8)
    monkeypatch.setattr(app.api, "verify_evm",
                        lambda proof, *a, **k: proof == b"\xab" * 8)
    monkeypatch.setattr(app.api, "download_keys", lambda *a, **k: None)

    code, body = _post(http_server, "/setup", {"degree": 17})
    assert (code, body) == (200, "keys generated")

    cred = wa.create_credential()
    assertion = wa.authenticate(cred, b"server-test")
    req_body = wa.prove_request_body(assertion, cred)
    code, body = _post(http_server, "/prove", req_body)
    assert code == 200 and body == "ab" * 8  # hex proof (main.rs:61-62)
    # the server passed through the LE bytes unchanged
    assert calls["prove"][0] == bytes(req_body["r"])

    code, body = _post(http_server, "/prove_evm", req_body)
    assert code == 200 and body == "ab" * 8

    code, body = _post(http_server, "/verify",
                       {"verifying_key_path": "", "proof": "ab" * 8})
    assert (code, body) == (200, "verified")
    code, body = _post(http_server, "/verify_evm",
                       {"verifying_key_path": "", "proof": "00" * 8})
    assert (code, body) == (200, "rejected")

    code, body = _post(http_server, "/nope", {})
    assert code == 404
    # error path -> 500 (reference unwrap parity, SURVEY §5.3)
    monkeypatch.setattr(app.api, "verify",
                        lambda *a, **k: (_ for _ in ()).throw(ValueError()))
    code, _ = _post(http_server, "/verify",
                    {"verifying_key_path": "", "proof": "zz"})
    assert code == 500


@pytest.mark.slow
def test_webauthn_to_verified_proof_e2e(http_server):
    """The full L7->L4 path: WebAuthn assertion -> /prove -> /verify
    (real prover; k=17 unless WH2_TEST_K overrides)."""
    import os

    k = int(os.environ.get("WH2_TEST_K", "17"))
    cred = wa.create_credential()
    assertion = wa.authenticate(cred, b"full-e2e")
    assert wa.verify_assertion_host(assertion, cred)
    body = wa.prove_request_body(assertion, cred)
    if k != 17:
        from webauthn_halo2_tpu.circuits.ecdsa_circuit import auto_params

        # write a key manifest so the server picks the smaller circuit
        from webauthn_halo2_tpu import api as _api

        _api.download_keys(k, "./keys/proving_key.pk",
                           "./keys/verifying_key.vk", params=auto_params(k))
    code, proof_hex = _post(http_server, "/prove", body)
    assert code == 200, proof_hex
    code, verdict = _post(http_server, "/verify",
                          {"verifying_key_path": "./keys/verifying_key.vk",
                           "proof": proof_hex})
    assert (code, verdict) == (200, "verified")


def test_bundler_lite_world(proof_and_verifier=None):
    """The demo's on-chain leg (server/bundler.py): counterfactual sender
    via getSenderAddress revert-parse, initCode deployment, paymaster
    sponsorship, handleOps execution, receipt store — the index.tsx
    296-429 flow against the in-repo EVM."""
    import sys

    sys.path.insert(0, "tests")
    from test_plonk_e2e import K, build_toy, build_witness

    from webauthn_halo2_tpu.plonk.keygen import keygen
    from webauthn_halo2_tpu.plonk.prover import create_proof
    from webauthn_halo2_tpu.plonk.srs import get_srs
    from webauthn_halo2_tpu.plonk.transcript import KeccakWrite
    from webauthn_halo2_tpu.evm.codegen import generate_verifier
    from webauthn_halo2_tpu.evm.yul_asm import compile_yul
    from webauthn_halo2_tpu.server.bundler import World

    cs = build_toy()
    fixed, advice, copies = build_witness(cs, 1 << K)
    srs = get_srs(K)
    pk = keygen(srs, cs, fixed, copies)
    proof = create_proof(pk, advice, [], scheme="gwc",
                         transcript=KeccakWrite())
    yul, _ = generate_verifier(pk.vk, srs)
    deploy, _ = compile_yul(yul)

    w = World(verifier_deploy=deploy)
    pub = bytes(range(64))
    sender = w.sender_for(pub)
    assert sender != 0
    # deterministic counterfactual address
    assert w.sender_for(pub) == sender

    r1 = w.submit(pub, proof)
    assert r1["success"], r1
    assert r1["accountDeployed"] is True
    assert (r1["counterBefore"], r1["counterAfter"]) == (0, 1)
    assert w.receipt(r1["userOpHash"]) == r1

    # second op: account exists, no initCode, nonce advanced
    r2 = w.submit(pub, proof)
    assert r2["success"], r2
    assert r2["accountDeployed"] is False
    assert (r2["counterBefore"], r2["counterAfter"]) == (1, 2)

    # a garbage proof does not execute
    r3 = w.submit(pub, b"\x00" * len(proof))
    assert not r3["success"]
    assert w.counter_value() == 2


def test_bundler_routes_plumbing(http_server, monkeypatch):
    """HTTP plumbing for /chain/* with a stubbed world."""
    from webauthn_halo2_tpu.server import bundler

    class FakeWorld:
        def sender_for(self, pk):
            return 0xABCD

        def submit(self, pk, proof):
            return {"userOpHash": "0x11", "success": True, "gasUsed": 5,
                    "sender": "0xabcd", "accountDeployed": True,
                    "counterBefore": 0, "counterAfter": 1, "revertData": ""}

        def receipt(self, h):
            return {"userOpHash": h} if h == "0x11" else None

    monkeypatch.setattr(bundler, "_WORLD", FakeWorld())
    code, body = _post(http_server, "/chain/sender", {"public_key": "00" * 64})
    assert code == 200 and json.loads(body)["sender"].endswith("abcd")
    code, body = _post(http_server, "/chain/submit_userop",
                       {"public_key": "00" * 64, "proof": "aa"})
    assert code == 200 and json.loads(body)["success"] is True
    code, body = _post(http_server, "/chain/receipt", {"userOpHash": "0x11"})
    assert code == 200
    code, body = _post(http_server, "/chain/receipt", {"userOpHash": "0x22"})
    assert code == 404
