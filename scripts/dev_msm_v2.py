#!/usr/bin/env python
"""Compile + validate + time the v2 MSM on the real TPU at k=17.

Cross-checks _msm_pallas_single_v2 against the v1 fused path (itself
host-oracle-verified) on identical inputs, then times both with
device-side-slice anchored pulls. Run while no other TPU process is up.
"""
import os
import sys
import time

os.environ.setdefault("WH2_TRACE", "1")
os.environ.setdefault(
    "WH2_SRS_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "artifacts"),
)

import secrets  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webauthn_halo2_tpu.fields.limbs import FR_SPEC  # noqa: E402
from webauthn_halo2_tpu.ops import ec as E  # noqa: E402
from webauthn_halo2_tpu.ops import modops as M  # noqa: E402
from webauthn_halo2_tpu.ops import msm_pallas as MP  # noqa: E402
from webauthn_halo2_tpu.plonk.srs import get_srs  # noqa: E402
from webauthn_halo2_tpu.utils.aot_cache import aot_wrap  # noqa: E402

K_DEG = int(os.environ.get("WH2_BENCH_K", "17"))
N = 1 << K_DEG
C_BITS = 13
KL = int(os.environ.get("WH2_MSM_KLANES", str(MP.DEFAULT_K_LANES)))




def pull(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    sl = leaf[tuple(slice(s - 1, s) for s in leaf.shape)]
    return np.asarray(sl)


def norm_x(curve, pt):
    """Affine x as canonical ints (representation-independent compare)."""
    return E.to_affine_ints(curve, pt)


def main():
    print(f"devices: {jax.devices()}  k={K_DEG} KL={KL}", flush=True)
    srs = get_srs(K_DEG)
    pts = srs.g_lag
    curve = E.BN254_CURVE
    sc = jnp.asarray(FR_SPEC.encode(
        [secrets.randbelow(FR_SPEC.p) for _ in range(N)]))
    pull(sc)

    t0 = time.time()
    r1 = MP._msm_single_aot(curve, pts, sc, C_BITS, MP.DEFAULT_K_LANES, False)
    a1 = norm_x(curve, r1)
    print(f"v1 warm+pull: {time.time()-t0:.1f}s", flush=True)

    ts = []
    for _ in range(3):
        t0 = time.time()
        r = MP._msm_single_aot(curve, pts, sc, C_BITS, MP.DEFAULT_K_LANES,
                               False)
        pull(r.x); pull(r.y); pull(r.z)
        ts.append(time.time() - t0)
    ts.sort()
    print(f"[msm v1] med={ts[1]*1e3:8.1f} ms  min={ts[0]*1e3:8.1f} ms"
          f" -> {N/ts[1]/1e6:.2f} Mpoints/s", flush=True)

    # v3: windows on device + host horner (scan kernel inside)
    t0 = time.time()
    a3 = MP.msm_hostout(curve, pts, sc[None], C_BITS, KL)
    print(f"v3 warm(compile?)+hostout: {time.time()-t0:.1f}s", flush=True)
    assert a3 == a1, f"v3 MISMATCH: {a3} vs {a1}"
    print("v1 == v3 (affine): True", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time()
        a3 = MP.msm_hostout(curve, pts, sc[None], C_BITS, KL)
        ts.append(time.time() - t0)
    ts.sort()
    print(f"[msm v3] med={ts[1]*1e3:8.1f} ms  min={ts[0]*1e3:8.1f} ms"
          f" -> {N/ts[1]/1e6:.2f} Mpoints/s (hostout e2e)", flush=True)


if __name__ == "__main__":
    main()
