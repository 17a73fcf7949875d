"""Microbench: MXU montmul (fused Pallas, int8/bf16) vs the VPU paths.

VERDICT r5 task 1's gate: ">=10x montmul throughput vs the current VPU
path". Chains iterations inside one jit graph (outputs are valid lazy
inputs) and anchors with a device-slice pull.
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webauthn_halo2_tpu.fields.limbs import FR_SPEC, L  # noqa: E402
from webauthn_halo2_tpu.ops import modops as M  # noqa: E402
from webauthn_halo2_tpu.ops.mxu_mod import mxu_montmul_rows  # noqa: E402

MM = 1 << 17
ITERS = 16


def _data():
    import secrets

    ints = [secrets.randbelow(FR_SPEC.p) for _ in range(MM)]
    ints2 = [secrets.randbelow(FR_SPEC.p) for _ in range(MM)]
    return (jnp.asarray(FR_SPEC.encode(ints)),
            jnp.asarray(FR_SPEC.encode(ints2)))


def bench(name, fn, a, b):
    try:
        out = fn(a, b)
        _ = np.asarray(out.reshape(-1)[:4])
        t0 = time.time()
        out = fn(a, b)
        _ = np.asarray(out.reshape(-1)[:4])
        dt = time.time() - t0
        rate = ITERS * MM / dt / 1e6
        print(f"{name:28s}: {dt*1e3:8.1f} ms  {rate:10.1f} Mmontmul/s",
              flush=True)
        return rate
    except Exception as e:  # noqa: BLE001
        print(f"{name:28s}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


def main():
    print("backend:", jax.default_backend(), flush=True)
    a, b = _data()
    at, bt = a.T.copy(), b.T.copy()

    @jax.jit
    def vpu_chain(a, b):
        x = a
        for _ in range(ITERS):
            x = M.montmul(FR_SPEC, x, b)
        return x

    def mk_mxu(block):
        @jax.jit
        def mxu_chain(a, b):
            x = a
            for _ in range(ITERS):
                x = mxu_montmul_rows(FR_SPEC, x, b, block=block)
            return x
        return mxu_chain

    base = bench("vpu CIOS (modops.montmul)", vpu_chain, a, b)
    for blk in (256, 512, 1024):
        os.environ["WH2_MXU_DOT"] = "int8"
        r = bench(f"mxu int8 pallas blk={blk}", mk_mxu(blk), at, bt)
        if base and r:
            print(f"    -> {r/base:.1f}x vs VPU", flush=True)
    os.environ["WH2_MXU_DOT"] = "bf16"
    r = bench("mxu bf16 pallas blk=512", mk_mxu(512), at, bt)
    if base and r:
        print(f"    -> {r/base:.1f}x vs VPU", flush=True)

    # correctness spot-check on device
    os.environ["WH2_MXU_DOT"] = "int8"
    got = FR_SPEC.decode(np.asarray(mxu_montmul_rows(FR_SPEC, at[:1024],
                                                     bt[:1024]).T))
    want = FR_SPEC.decode(np.asarray(M.montmul(FR_SPEC, a[:, :1024],
                                               b[:, :1024])))
    print("exactness vs VPU (1024):", got == want, flush=True)


if __name__ == "__main__":
    main()
