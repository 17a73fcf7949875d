"""AOT executable cache: pickle compiled XLA executables to disk.

The tunneled `axon` TPU backend does not restore compiles from the JAX
persistent cache, so every fresh process pays the full remote
XLA+Mosaic compile for each big jit (~8 min for the fused MSM alone,
>1 h for a whole proof — the round-1 driver-bench failure mode). This
module wraps `jax.experimental.serialize_executable`: the first process
to compile a (function, shapes, statics) combination serializes the
loaded executable under artifacts/aot/; every later process
`deserialize_and_load`s it in seconds.

Usage: wrap a jitted function once at module level —

    fn = aot_wrap("msm_single", _msm_pallas_single, static_argnums=(0, 3, 4, 5))

The wrapper is signature-compatible with the jitted function. Keys
include argument shapes/dtypes and static-arg reprs; stale entries (jax
version change, code change via WH2_AOT_SALT) fail to load and fall back
to a normal compile.
"""
from __future__ import annotations

import hashlib
import os
import pickle
import sys
import time

import jax

_DIR = os.environ.get(
    "WH2_AOT_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "artifacts", "aot"),
)
_SALT = os.environ.get("WH2_AOT_SALT", "r2")
_MEM: dict = {}


def _enabled() -> bool:
    mode = os.environ.get("WH2_AOT", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return jax.default_backend() == "tpu"


def _log(msg: str) -> None:
    if os.environ.get("WH2_TRACE"):
        print(f"[aot] {msg}", file=sys.stderr, flush=True)


def _arg_sig(a) -> str:
    leaves = jax.tree_util.tree_leaves(a)
    parts = []
    for leaf in leaves:
        if hasattr(leaf, "shape"):
            parts.append(f"{getattr(leaf, 'dtype', '?')}{tuple(leaf.shape)}")
        else:
            parts.append(repr(leaf))
    return ",".join(parts)


def aot_wrap(name: str, jitted_fn, static_argnums: tuple = ()):
    """Wrap a jitted function with the AOT executable disk cache."""

    def call(*args):
        if not _enabled():
            return jitted_fn(*args)
        statics = {i: args[i] for i in static_argnums}
        dyn = [a for i, a in enumerate(args) if i not in statics]
        h = hashlib.blake2b(digest_size=12)
        h.update(_SALT.encode())
        h.update(jax.__version__.encode())
        h.update(repr(sorted((i, repr(v)) for i, v in statics.items())).encode())
        for a in dyn:
            h.update(_arg_sig(a).encode())
        key = f"{name}_{h.hexdigest()}"
        if key in _MEM:
            return _MEM[key](*dyn)
        path = os.path.join(_DIR, key + ".pkl")
        if os.path.exists(path):
            try:
                t0 = time.time()
                with open(path, "rb") as f:
                    payload, in_tree, out_tree = pickle.load(f)
                from jax.experimental.serialize_executable import (
                    deserialize_and_load,
                )

                compiled = deserialize_and_load(payload, in_tree, out_tree)
                _MEM[key] = compiled
                _log(f"{key}: loaded in {time.time()-t0:.1f}s")
                try:  # mark as recently-used for scripts/gc_aot.py
                    os.utime(path)
                except OSError:
                    pass
                return compiled(*dyn)
            except Exception as e:  # stale/incompatible: recompile
                _log(f"{key}: load failed ({e}); recompiling")
        t0 = time.time()
        # The tunneled backend's remote-compile relay intermittently drops
        # the connection on long compiles ("response body closed before
        # all bytes were read", INTERNAL). Compiles are idempotent and
        # every finished graph is disk-cached, so retrying here turns an
        # hour-long multi-graph run from all-or-nothing into resumable.
        attempts = int(os.environ.get("WH2_COMPILE_RETRIES", "4"))
        for attempt in range(attempts):
            try:
                compiled = jitted_fn.lower(*args).compile()
                break
            except Exception as e:  # jax.errors.JaxRuntimeError et al.
                transient = ("remote_compile" in str(e)
                             or "INTERNAL" in str(e))
                if not transient or attempt == attempts - 1:
                    raise
                _log(f"{key}: compile attempt {attempt + 1} failed "
                     f"({str(e)[:120]}); retrying in 30s")
                time.sleep(30)
        _log(f"{key}: compiled in {time.time()-t0:.1f}s")
        _MEM[key] = compiled
        try:
            from jax.experimental.serialize_executable import serialize

            payload, in_tree, out_tree = serialize(compiled)
            os.makedirs(_DIR, exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            os.replace(tmp, path)
            _log(f"{key}: serialized {len(payload)/1e6:.0f} MB")
        except Exception as e:
            _log(f"{key}: serialize failed ({e})")
        return compiled(*dyn)

    call.__name__ = f"aot_{name}"
    return call
