"""Probe raw MXU throughput on the real chip: int8 / bf16 / f32 chained matmuls.

Measurement discipline (memory/ROUND4): chain many matmuls inside ONE jit
graph to amortize the ~25-30 ms tunnel dispatch overhead, and anchor the
timing with a device-side tiny slice pulled via np.asarray.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp


def bench(name, dtype, acc_dtype, n=2048, iters=64):
    key = jax.random.PRNGKey(0)
    if "int" in name:
        A = jax.random.randint(key, (n, n), -8, 8, dtype=jnp.int32).astype(dtype)
        Bm = jax.random.randint(key, (n, n), -8, 8, dtype=jnp.int32).astype(dtype)
    else:
        A = jax.random.normal(key, (n, n), dtype=jnp.float32).astype(dtype)
        Bm = (jax.random.normal(key, (n, n), dtype=jnp.float32) * 0.01).astype(dtype)

    @jax.jit
    def chain(A, B):
        def body(i, A):
            C = jax.lax.dot_general(A, B, (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc_dtype)
            if "int" in name:
                return (C & 7).astype(dtype)
            return (C * 1e-2).astype(dtype)
        return jax.lax.fori_loop(0, iters, body, A)

    try:
        out = chain(A, Bm)
        _ = np.asarray(out[0, :4])  # compile + warm
        t0 = time.time()
        out = chain(A, Bm)
        _ = np.asarray(out[0, :4])  # anchored pull
        dt = time.time() - t0
        macs = iters * n * n * n
        print(f"{name:14s} n={n}: {dt*1e3:8.1f} ms  {2*macs/dt/1e12:8.1f} TOPS",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    bench("int8->int32", jnp.int8, jnp.int32)
    bench("uint8->uint32", jnp.uint8, jnp.uint32)
    bench("bf16->f32", jnp.bfloat16, jnp.float32)
    bench("f32->f32", jnp.float32, jnp.float32)
    # skinny contraction shape closer to the montmul eval matmuls
    bench("int8->int32", jnp.int8, jnp.int32, n=512, iters=256)
