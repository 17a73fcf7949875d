#!/usr/bin/env python
"""Anchored profile of the NTT pieces feeding the quotient phase
(round-4 #2: quotient = 10.4 s of the 38.6 s proof).

Times, at k and k+rate: the bitrev gather, one full ntt, one intt,
coset_shift, and a montmul_pallas pass — each as its own AOT-cached
graph with device-side-slice anchored pulls.
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

from webauthn_halo2_tpu.fields.limbs import FR_SPEC, L  # noqa: E402
from webauthn_halo2_tpu.ops import modops as M  # noqa: E402
from webauthn_halo2_tpu.ops import ntt as N  # noqa: E402
from webauthn_halo2_tpu.plonk.domain import COSET_GEN  # noqa: E402
from webauthn_halo2_tpu.utils.aot_cache import aot_wrap  # noqa: E402


def pull(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf[tuple(slice(s - 1, s) for s in leaf.shape)])


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    pull(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        pull(out)
        ts.append(time.time() - t0)
    ts.sort()
    print(f"[ntt] {name:22s} med={ts[len(ts)//2]*1e3:8.1f} ms", flush=True)
    return out


def main():
    print(f"devices: {jax.devices()}", flush=True)
    for k in (17, 19):
        n = 1 << k
        a = jnp.asarray(np.asarray(
            FR_SPEC.encode([secrets.randbelow(FR_SPEC.p)
                            for _ in range(n)]), dtype=np.int32))
        pull(a)

        perm = jnp.asarray(N._bitrev_perm(k))
        bitrev = aot_wrap(f"prof4_bitrev{k}",
                          jax.jit(lambda x, p: x[:, p]))
        timed(f"k={k} bitrev gather", bitrev, a, perm)

        from webauthn_halo2_tpu.ops import ntt_pallas as NP

        xla_ntt = aot_wrap(f"prof4_ntt{k}", jax.jit(
            lambda x: N._ntt_core(FR_SPEC, x, k, False, FR_SPEC.p,
                                  N._base_root(FR_SPEC))))
        ref = timed(f"k={k} ntt (xla)", xla_ntt, a)
        fused = aot_wrap(f"prof4_nttf{k}", jax.jit(
            lambda x: NP.ntt_fused(FR_SPEC, x, k, False)))
        got = timed(f"k={k} ntt (fused)", fused, a)
        same = (FR_SPEC.decode(np.asarray(got))
                == FR_SPEC.decode(np.asarray(ref)))
        print(f"[ntt] k={k} fused == xla: {same}", flush=True)
        assert same
        fusedi = aot_wrap(f"prof4_inttf{k}", jax.jit(
            lambda x: NP.ntt_fused(FR_SPEC, x, k, True)))
        goti = timed(f"k={k} intt (fused)", fusedi, a)

        intt_w = aot_wrap(f"prof4_intt{k}", jax.jit(
            lambda x: N.intt(FR_SPEC, x, k)))
        timed(f"k={k} intt", intt_w, a)

        cs_w = aot_wrap(f"prof4_coset{k}", jax.jit(
            lambda x: N.coset_shift(FR_SPEC, x, COSET_GEN)))
        timed(f"k={k} coset_shift", cs_w, a)

        mm_w = aot_wrap(f"prof4_mm{k}", jax.jit(
            lambda x: M.montmul(FR_SPEC, x, x)))
        timed(f"k={k} montmul (full)", mm_w, a)

        # one butterfly stage worth of XLA glue (reshape+concat pattern)
        @jax.jit
        def one_stage(x):
            h = n // 4
            xr = x.reshape(L, 2, 2 * h)
            lo = xr[:, 0]
            hi = xr[:, 1]
            whi = M.montmul(FR_SPEC, lo, hi)
            return jnp.concatenate(
                [M.add(FR_SPEC, lo, whi)[:, None],
                 M.sub(FR_SPEC, lo, whi)[:, None]], axis=1).reshape(L, n)

        st_w = aot_wrap(f"prof4_stage{k}", one_stage)
        timed(f"k={k} one stage glue", st_w, a)


if __name__ == "__main__":
    main()
