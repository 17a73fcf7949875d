#!/usr/bin/env python
"""Multi-host (DCN) launch path for batched proving (SURVEY §5.8, §2.3).

The reference is strictly single-process (rayon threads only); scale-out
is a new TPU-native capability. Model:

* **Data-parallel proving** (BASELINE config 5): N independent
  signatures -> N proofs. Proofs need NO cross-host collectives, so each
  host proves its round-robin shard `i % num_hosts == process_index` and
  scaling is communication-free; determinism comes from the shared
  deterministic SRS (plonk/srs.py) — every host derives bit-identical
  parameters and keys, asserted below via the vk transcript digest.
* Intra-proof sharding (TP MSM / distributed NTT, parallel/sharded.py)
  composes on top within each host's local mesh.

Launch (standard JAX distributed bootstrap — one command per host):

    python scripts/launch_multihost.py \
        --coordinator <host0-ip>:9977 --num-hosts 4 --host-id <i> \
        --batch 64 [--k 17]

Local simulation (4 processes on this machine, CPU backend):

    python scripts/launch_multihost.py --simulate 4 --batch 8 --k 6 --toy
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(args) -> None:
    if args.coordinator:
        import jax

        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts,
            process_id=args.host_id,
        )
    import secrets

    from webauthn_halo2_tpu.fields.constants import P256_N
    from webauthn_halo2_tpu.fields.ref_curve import ecdsa_keygen, ecdsa_sign
    from webauthn_halo2_tpu.plonk.srs import get_srs
    from webauthn_halo2_tpu.plonk.verifier import verify_proof

    t0 = time.time()
    if args.toy:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests"))
        from test_plonk_e2e import build_toy, build_witness

        from webauthn_halo2_tpu.plonk.keygen import keygen
        from webauthn_halo2_tpu.plonk.prover import create_proof

        cs = build_toy()
        srs = get_srs(args.k)
        fixed, advice, copies = build_witness(cs, 1 << args.k)
        pk = keygen(srs, cs, fixed, copies)
        my = [i for i in range(args.batch)
              if i % args.num_hosts == args.host_id]
        proofs = {}
        per_proof = []
        for i in my:
            t1 = time.time()
            proofs[i] = create_proof(pk, advice, [])
            per_proof.append(round(time.time() - t1, 3))
    else:
        from webauthn_halo2_tpu import api
        from webauthn_halo2_tpu.circuits.ecdsa_circuit import auto_params

        params = auto_params(args.k)
        pk = api._keys(params)
        my = [i for i in range(args.batch)
              if i % args.num_hosts == args.host_id]
        reqs = []
        for _ in my:
            sk, pub = ecdsa_keygen()
            m = secrets.randbelow(P256_N)
            r, s = ecdsa_sign(m, sk)
            reqs.append(dict(
                r=list(r.to_bytes(32, "little")),
                s=list(s.to_bytes(32, "little")),
                msghash=list(m.to_bytes(32, "little")),
                pubkey_x=list(pub[0].to_bytes(32, "little")),
                pubkey_y=list(pub[1].to_bytes(32, "little")),
            ))
        t1 = time.time()
        batch = api.generate_proofs_batch(reqs, params=params)
        per_proof = [round((time.time() - t1) / max(len(batch), 1), 3)]
        proofs = dict(zip(my, batch))

    # determinism assertion: every host must hold the SAME keys — the vk
    # digest is the cross-host conformance oracle (bit-identical proofs
    # regardless of which host proves which signature, SURVEY §4)
    for i, p in proofs.items():
        assert verify_proof(pk.vk, pk.srs, p, []), f"proof {i} invalid"
    steady = per_proof[1:] or per_proof  # first proof pays the compiles
    out = {
        "host": args.host_id,
        "proved": sorted(proofs),
        "vk_digest": hex(pk.vk.transcript_repr)[:34],
        "wall_s": round(time.time() - t0, 2),
        "per_proof_s": per_proof,
        "steady_proofs_per_s": round(
            len(steady) / max(sum(steady), 1e-9), 4),
        "proofs_per_s": round(len(proofs) / (time.time() - t0), 4),
    }
    print(json.dumps(out), flush=True)


def simulate(n: int, argv: list[str]) -> int:
    """Spawn n local worker processes (CPU backend) and merge results."""
    procs = []
    for i in range(n):
        # CPU-only workers: disable the axon plugin handshake (a wedged
        # tunnel otherwise hangs `import jax`), and apply the same
        # XLA:CPU crash mitigations as tests/conftest.py — montmul-heavy
        # backend compiles segfault intermittently without them
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            PALLAS_AXON_POOL_IPS="",
            XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                       + " --xla_cpu_parallel_codegen_split_count=1"
                       + " --xla_backend_optimization_level=0"
                       + " --xla_llvm_disable_expensive_passes=true").strip(),
        )
        cmd = [sys.executable, os.path.abspath(__file__),
               "--num-hosts", str(n), "--host-id", str(i)] + argv
        procs.append(subprocess.Popen(cmd, env=env,
                                      stdout=subprocess.PIPE, text=True))
    proved = set()
    digests = set()
    for p in procs:
        out, _ = p.communicate()
        if p.returncode:
            print(out, file=sys.stderr)
            return p.returncode
        line = json.loads(out.strip().splitlines()[-1])
        print(line)
        proved.update(line["proved"])
        digests.add(line["vk_digest"])
    assert len(digests) == 1, f"hosts derived different vks: {digests}"
    print(f"all {len(proved)} proofs verified across {n} hosts; "
          f"vk digest identical: {digests.pop()}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--num-hosts", type=int, default=1)
    ap.add_argument("--host-id", type=int, default=0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k", type=int, default=17)
    ap.add_argument("--toy", action="store_true",
                    help="toy circuit (fast CPU check)")
    ap.add_argument("--simulate", type=int, default=0,
                    help="spawn N local worker processes")
    args, extra = ap.parse_known_args()
    if args.simulate:
        argv = ["--batch", str(args.batch), "--k", str(args.k)]
        if args.toy:
            argv.append("--toy")
        return simulate(args.simulate, argv)
    worker(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
