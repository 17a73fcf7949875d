"""Library API: the `ecdsa_p256.rs` function surface, TPU-native.

Mirrors the reference's prover/verifier library functions
(ecdsa_p256.rs:256-469): download_keys, generate_proof[_evm],
verify[_evm], generate_verifier — with the same raw 32-byte little-endian
field input convention (Fp::from_bytes — ecdsa_p256.rs:346-352; the web
client byte-reverses to LE at index.tsx:287-294).

Key artifacts: the reference serializes pk/vk blobs (SerdeFormat::RawBytes,
~100MB). Our keys are deterministic functions of (circuit params, SRS
seed), so key files are small manifests; the heavy tensors are rebuilt
once per process and cached in memory — deliberately fixing the
per-request reload inefficiency noted in SURVEY §3.2.
"""
from __future__ import annotations

import json
import os
import time

from .circuits.ecdsa_circuit import CircuitParams, ECDSACircuit, ECDSAInputs
from .fields.ref_curve import P256_CURVE
from .plonk.keygen import ProvingKey
from .plonk.pk_cache import keygen_cached
from .plonk.prover import create_proof
from .plonk.srs import get_srs
from .plonk.verifier import verify_proof

_PK_CACHE: dict = {}


def _keys(params: CircuitParams, srs_seed: bytes = b"dev") -> ProvingKey:
    key = (params.to_json(), srs_seed)
    if key not in _PK_CACHE:
        srs = get_srs(params.degree, srs_seed)
        circuit = ECDSACircuit(params)
        cs, fixed, _advice, copies = circuit.build(ECDSAInputs.dummy())
        # disk-cached keygen (pk.to_bytes parity, ecdsa_p256.rs:261-270)
        _PK_CACHE[key] = keygen_cached(srs, cs, fixed, copies)
    return _PK_CACHE[key]


def download_keys(degree: int, pk_path: str, vk_path: str,
                  params: CircuitParams | None = None) -> None:
    """keygen + write key manifests (download_keys, ecdsa_p256.rs:256-272)."""
    params = params or CircuitParams(degree=degree)
    params.degree = degree
    pk = _keys(params)
    manifest = {
        "kind": "webauthn-halo2-tpu-key",
        "params": json.loads(params.to_json()),
        "srs_seed": "dev",
        "vk_transcript_repr": hex(pk.vk.transcript_repr),
        "created": time.time(),
    }
    for path in (pk_path, vk_path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(manifest, f)


def _load_params(key_path: str) -> CircuitParams:
    if os.path.exists(key_path):
        with open(key_path) as f:
            m = json.load(f)
        return CircuitParams(**m["params"])
    return CircuitParams()


def le_bytes_to_int(b: bytes | list[int]) -> int:
    return int.from_bytes(bytes(b), "little")


def generate_proof(r: bytes, s: bytes, pubkey_x: bytes, pubkey_y: bytes,
                   msghash: bytes, proving_key_path: str = "",
                   params: CircuitParams | None = None) -> bytes:
    """Blake2b/SHPLONK proof from raw LE byte inputs (ecdsa_p256.rs:379-427)."""
    params = params or _load_params(proving_key_path)
    pk = _keys(params)
    inputs = ECDSAInputs(
        r=le_bytes_to_int(r),
        s=le_bytes_to_int(s),
        msghash=le_bytes_to_int(msghash),
        pk=(le_bytes_to_int(pubkey_x), le_bytes_to_int(pubkey_y)),
    )
    circuit = ECDSACircuit(params)
    advice = circuit.witness(inputs)
    return create_proof(pk, advice, circuit.public_inputs(inputs))


def verify(proof: bytes, verifying_key_path: str = "",
           params: CircuitParams | None = None,
           public_inputs: list | None = None) -> bool:
    """Verify a Blake2b/SHPLONK proof (ecdsa_p256.rs:429-445). With
    expose_msghash circuits, public_inputs carries the claimed msghash
    limbs."""
    params = params or _load_params(verifying_key_path)
    pk = _keys(params)
    return verify_proof(pk.vk, pk.srs, proof, public_inputs or [])


def generate_proof_evm(r: bytes, s: bytes, pubkey_x: bytes, pubkey_y: bytes,
                       msghash: bytes, proving_key_path: str = "",
                       params: CircuitParams | None = None,
                       scheme: str = "gwc") -> bytes:
    """Keccak(EVM)-transcript proof: GWC (ecdsa_p256.rs:329-377 parity)
    or SHPLONK (scheme="shplonk": ~half the on-chain ecMul gas)."""
    from .plonk.transcript import KeccakWrite

    params = params or _load_params(proving_key_path)
    pk = _keys(params)
    inputs = ECDSAInputs(
        r=le_bytes_to_int(r),
        s=le_bytes_to_int(s),
        msghash=le_bytes_to_int(msghash),
        pk=(le_bytes_to_int(pubkey_x), le_bytes_to_int(pubkey_y)),
    )
    circuit = ECDSACircuit(params)
    advice = circuit.witness(inputs)
    return create_proof(pk, advice, circuit.public_inputs(inputs),
                        scheme=scheme, transcript=KeccakWrite())


def verify_evm(proof: bytes, verifying_key_path: str = "",
               params: CircuitParams | None = None,
               public_inputs: list | None = None,
               scheme: str = "gwc") -> bool:
    from .plonk.transcript import KeccakRead

    params = params or _load_params(verifying_key_path)
    pk = _keys(params)
    return verify_proof(pk.vk, pk.srs, proof, public_inputs or [],
                        scheme=scheme, transcript=KeccakRead(proof))


def generate_verifier(
    verifying_key_path: str = "",
    sol_code_path: str = "verifier.sol",
    deploy_code_path: str = "verifier.code",
    yul_code_path: str = "verifier.yul",
    valid_proof_hex: str | None = None,
    params: CircuitParams | None = None,
    scheme: str = "gwc",
) -> int | None:
    """EVM verifier codegen (ecdsa_p256.rs:275-327 / snark-verifier parity):
    writes .yul, .sol and .code artifacts. The .code file holds REAL deploy
    bytecode (DeploymentCode {code: Vec<u8>} parity, main.rs:371-374),
    assembled by evm/yul_asm.py. If a valid proof is supplied, the verifier
    is deployed in the bytecode EVM and the proof dry-run with gas metering
    (the revm step at ecdsa_p256.rs:303-324); returns gas used, else None.
    """
    import json as _json

    from .evm.codegen import generate_verifier as _gen
    from .evm.machine import Chain
    from .evm.yul_asm import compile_yul

    params = params or _load_params(verifying_key_path)
    pk = _keys(params)
    num_public = (params.num_limbs if params.expose_msghash else 0)
    yul, sol = _gen(pk.vk, pk.srs, num_public=num_public, scheme=scheme)
    deploy, _runtime = compile_yul(yul)
    gas_used = None
    if valid_proof_hex:
        chain = Chain()
        addr, res = chain.create(0xD0, deploy)
        assert res.success, "verifier deployment failed"
        run = chain.call(0xD0, addr, bytes.fromhex(valid_proof_hex))
        assert run.success, (
            "generated verifier rejected the supplied valid proof"
        )
        gas_used = run.gas_used
    with open(yul_code_path, "w") as f:
        f.write(yul)
    with open(sol_code_path, "w") as f:
        f.write(sol)
    with open(deploy_code_path, "w") as f:
        _json.dump({"code": list(deploy)}, f)
    return gas_used


def generate_proofs_batch(
    requests: list[dict],
    proving_key_path: str = "",
    params: CircuitParams | None = None,
    scheme: str = "shplonk",
) -> list[bytes]:
    """Batched multi-signature proving (SURVEY §2.3 "Batch proving (DP
    analog)", BASELINE config 5): N independent signatures -> N proofs.

    Each request: {r, s, pubkey_x, pubkey_y, msghash} as LE byte lists
    (ProveRequestBody parity, main.rs:39-47). All proofs share one
    ProvingKey and one set of compiled phase graphs, so the marginal cost
    per proof is pure device work: the batch amortizes the per-process
    compile exactly like a data-parallel shard does. On a multi-chip mesh
    the same loop runs per-host with requests sharded round-robin (each
    proof is single-chip; DP needs no collectives — proofs are
    independent), so scaling efficiency is communication-free.
    """
    from concurrent.futures import ThreadPoolExecutor

    from .plonk.transcript import KeccakWrite

    params = params or _load_params(proving_key_path)
    pk = _keys(params)
    circuit = ECDSACircuit(params)

    def prep(req):
        inputs = ECDSAInputs(
            r=le_bytes_to_int(req["r"]),
            s=le_bytes_to_int(req["s"]),
            msghash=le_bytes_to_int(req["msghash"]),
            pk=(le_bytes_to_int(req["pubkey_x"]),
                le_bytes_to_int(req["pubkey_y"])),
        )
        return circuit.witness(inputs), circuit.public_inputs(inputs)

    # two-stage pipeline: witness generation (host CPU, ~1-3 s each) in
    # one worker pool, and TWO concurrent create_proof workers — the
    # device serializes their dispatches, so while proof i occupies the
    # chip, proof i+1 runs its host segments (witness packing, lookup
    # permutation sorts, transcript hashing). Proofs are independent;
    # the compiled phase graphs are shared and thread-safe.
    def prove(args):
        advice, instances = args
        if scheme == "gwc":
            return create_proof(pk, advice, instances, scheme="gwc",
                                transcript=KeccakWrite())
        return create_proof(pk, advice, instances)

    with ThreadPoolExecutor(max_workers=1) as wpool, \
            ThreadPoolExecutor(max_workers=2) as ppool:
        wfuts = [wpool.submit(prep, r) for r in requests]
        pfuts = [ppool.submit(prove, f.result()) for f in wfuts]
        return [f.result() for f in pfuts]
