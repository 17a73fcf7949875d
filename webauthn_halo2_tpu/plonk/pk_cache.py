"""On-disk proving-key cache (pk.to_bytes parity, ecdsa_p256.rs:261-270).

The reference serializes pk/vk once with `SerdeFormat::RawBytes` and every
server boot loads them from `./keys/` instead of re-running keygen
(SURVEY §3.1, §5.4). Round-1 re-ran keygen (250-1,184 s under the
tunneled backend) on every process start; this module makes keygen a
write-once artifact: all ProvingKey tensors go into one .npz keyed by a
digest of (k, constraint system, fixed assignment, copy constraints), so
a stale cache can never be loaded for a changed circuit.

Tensors are stored as raw int32 limb arrays (Montgomery form, exactly as
the prover consumes them); total ~1.3 GB at k=17 — cheap against the
20-minute keygen it replaces.
"""
from __future__ import annotations

import hashlib
import os

import jax.numpy as jnp
import numpy as np

from ..fields.limbs import ints_to_limbs_fast
from . import cs as CS
from .keygen import ProvingKey, VerifyingKey, _domain_for, keygen
from .srs import SRS


def _cs_repr(cs: CS.ConstraintSystem) -> bytes:
    # cs.degree() is included explicitly: it determines extended-domain
    # shapes and h-piece counts, and its computation has changed across
    # cache-format revisions (e.g. true gate degree for permutation-free
    # circuits) — without it a pk cached by older code could load with
    # stale tensor shapes. "v2" bumps the format for that change.
    return repr(
        ("v2", cs.degree(), cs.num_fixed, cs.num_advice, cs.num_instance,
         [(nm, str(g)) for nm, g in cs.gates],
         [(lk.name, [str(e) for e in lk.inputs], [str(e) for e in lk.tables])
          for lk in cs.lookups],
         cs.perm_columns)
    ).encode()


def _cs_repr_v1(cs: CS.ConstraintSystem) -> bytes:
    """Round-3 cs repr (no degree field) — kept only to locate and migrate
    cache artifacts written before the v2 format bump."""
    return repr(
        (cs.num_fixed, cs.num_advice, cs.num_instance,
         [(nm, str(g)) for nm, g in cs.gates],
         [(lk.name, [str(e) for e in lk.inputs], [str(e) for e in lk.tables])
          for lk in cs.lookups],
         cs.perm_columns)
    ).encode()


def pk_digest(k: int, cs: CS.ConstraintSystem, fixed_cols: list,
              copies: list, tau_seed: bytes | None = b"dev",
              cs_repr=None) -> str:
    """Cache key: everything keygen's output depends on — the SRS identity
    (k + tau seed: vk commitments and pk.srs both depend on the full SRS,
    not just its size) and the circuit description. tau_seed=None computes
    the legacy (round-2) digest that omitted the seed, used only to migrate
    old cache files forward."""
    h = hashlib.blake2b(digest_size=16)
    h.update(k.to_bytes(4, "little"))
    if tau_seed is not None:
        h.update(b"srs-seed:")
        h.update(tau_seed)
    h.update((cs_repr or _cs_repr)(cs))
    for col in fixed_cols:
        h.update(np.asarray(
            ints_to_limbs_fast([int(v) for v in col]), dtype=np.int32
        ).tobytes())
    h.update(repr(copies).encode())
    return h.hexdigest()


def save_pk(path: str, pk: ProvingKey) -> None:
    vk = pk.vk
    arrays: dict[str, np.ndarray] = {}

    def put_list(prefix: str, lst: list) -> None:
        arrays[f"{prefix}_len"] = np.asarray([len(lst)])
        for i, t in enumerate(lst):
            arrays[f"{prefix}_{i}"] = np.asarray(t)

    put_list("fixed_lag", pk.fixed_lagrange)
    put_list("fixed_coeff", pk.fixed_coeff)
    put_list("fixed_ext", pk.fixed_ext)
    put_list("sigma_lag", pk.sigma_lagrange)
    put_list("sigma_coeff", pk.sigma_coeff)
    put_list("sigma_ext", pk.sigma_ext)
    arrays["l0_ext"] = np.asarray(pk.l0_ext)
    arrays["llast_ext"] = np.asarray(pk.llast_ext)
    arrays["lblind_ext"] = np.asarray(pk.lblind_ext)
    arrays["x_ext"] = np.asarray(pk.x_ext)
    arrays["omega_pows"] = np.asarray(
        ints_to_limbs_fast([int(v) for v in pk.omega_pows_np]), dtype=np.int32
    )
    # vk commitments: affine (x, y) int pairs -> 2x32 LE bytes each
    def comms_bytes(comms: list) -> np.ndarray:
        out = np.zeros((len(comms), 2, 32), dtype=np.uint8)
        for i, (x, y) in enumerate(comms):
            out[i, 0] = np.frombuffer(int(x).to_bytes(32, "little"), np.uint8)
            out[i, 1] = np.frombuffer(int(y).to_bytes(32, "little"), np.uint8)
        return out

    arrays["vk_fixed_comms"] = comms_bytes(vk.fixed_commitments)
    arrays["vk_perm_comms"] = comms_bytes(vk.perm_commitments)
    arrays["vk_repr"] = np.frombuffer(
        int(vk.transcript_repr).to_bytes(64, "little"), np.uint8
    ).copy()
    tmp = f"{path}.{os.getpid()}.tmp"  # pid-suffixed: concurrent writers
    with open(tmp, "wb") as f:         # cannot clobber each other
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_pk(path: str, srs: SRS, cs: CS.ConstraintSystem) -> ProvingKey:
    z = np.load(path)
    domain = _domain_for(cs, srs.k)

    def get_list(prefix: str, dtype=None) -> list:
        return [jnp.asarray(z[f"{prefix}_{i}"].astype(dtype)
                            if dtype is not None else z[f"{prefix}_{i}"])
                for i in range(int(z[f"{prefix}_len"][0]))]

    def comms_of(name: str) -> list:
        raw = z[name]
        return [
            (int.from_bytes(raw[i, 0].tobytes(), "little"),
             int.from_bytes(raw[i, 1].tobytes(), "little"))
            for i in range(raw.shape[0])
        ]

    vk = VerifyingKey(
        domain, cs, comms_of("vk_fixed_comms"), comms_of("vk_perm_comms"),
        int.from_bytes(z["vk_repr"].tobytes(), "little"),
    )
    from ..fields.limbs import limbs_to_ints_fast

    omega_ints = limbs_to_ints_fast(z["omega_pows"])
    omega_np = np.empty(len(omega_ints), dtype=object)
    omega_np[:] = omega_ints
    return ProvingKey(
        vk, srs,
        get_list("fixed_lag"), get_list("fixed_coeff"),
        get_list("fixed_ext", np.int16),
        [], get_list("sigma_lag"), get_list("sigma_coeff"),
        get_list("sigma_ext", np.int16), [],
        jnp.asarray(z["l0_ext"].astype(np.int16)),
        jnp.asarray(z["llast_ext"].astype(np.int16)),
        jnp.asarray(z["lblind_ext"].astype(np.int16)),
        jnp.asarray(z["x_ext"].astype(np.int16)),
        omega_np,
    )


def keygen_cached(srs: SRS, cs: CS.ConstraintSystem, fixed_cols: list,
                  copies: list, cache_dir: str | None = None) -> ProvingKey:
    """keygen with a write-once on-disk artifact (the reference's
    download_keys flow: generate once, then always load)."""
    cache_dir = cache_dir or os.environ.get(
        "WH2_KEY_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "keys"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    digest = pk_digest(srs.k, cs, fixed_cols, copies, srs.tau_seed)
    path = os.path.join(cache_dir, f"pk_k{srs.k}_{digest}.npz")
    if not os.path.exists(path):
        # migrate artifacts written under older digest formats (content is
        # unchanged — only the cache key format evolved): v1 repr without
        # the degree field, and the round-2 seed-less digest (those were
        # only ever generated under the default b"dev" SRS)
        legacy_digests = [
            pk_digest(srs.k, cs, fixed_cols, copies, srs.tau_seed,
                      cs_repr=_cs_repr_v1),
        ]
        if srs.tau_seed == b"dev":
            legacy_digests.append(
                pk_digest(srs.k, cs, fixed_cols, copies, None,
                          cs_repr=_cs_repr_v1))
        for ld in legacy_digests:
            legacy = os.path.join(cache_dir, f"pk_k{srs.k}_{ld}.npz")
            if os.path.exists(legacy):
                os.replace(legacy, path)
                break
    if os.path.exists(path):
        return load_pk(path, srs, cs)
    pk = keygen(srs, cs, fixed_cols, copies)
    save_pk(path, pk)
    return pk
