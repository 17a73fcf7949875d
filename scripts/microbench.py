"""Microbenchmark: XLA vs Pallas field/EC primitives on the real TPU.

Measures the costs that drive the MSM/prover redesign:
  * montmul (XLA) vs montmul_pallas at the hot shapes
  * add_unsafe (XLA) vs fused pallas add at the MSM step shape
  * pallas launch overhead (many tiny launches)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("WH2_SRS_DIR", "/root/repo/artifacts")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/artifacts/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from webauthn_halo2_tpu.fields.limbs import FQ_SPEC, L
from webauthn_halo2_tpu.ops import ec as E
from webauthn_halo2_tpu.ops import modops as M
from webauthn_halo2_tpu.ops import pallas_kernels as PK


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:50s} {dt*1e3:10.3f} ms", flush=True)
    return dt


def rand_limbs(shape, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 256, size=(L,) + shape, dtype=np.int32))


def main():
    n_big = 1 << 17
    n_step = 2048

    a = rand_limbs((n_big,), 1)
    b = rand_limbs((n_big,), 2)
    timeit("montmul XLA (33,131072)", jax.jit(lambda a, b: M.montmul(FQ_SPEC, a, b)), a, b)
    timeit("montmul pallas (33,131072)", lambda a, b: PK.montmul_pallas(FQ_SPEC, a, b), a, b)

    a2 = rand_limbs((n_step,), 3)
    b2 = rand_limbs((n_step,), 4)
    timeit("montmul XLA (33,2048)", jax.jit(lambda a, b: M.montmul(FQ_SPEC, a, b)), a2, b2)
    timeit("montmul pallas (33,2048)", lambda a, b: PK.montmul_pallas(FQ_SPEC, a, b), a2, b2)

    # EC add at MSM step shape
    p = E.JPoint(rand_limbs((n_step,), 5) & 0xFF, rand_limbs((n_step,), 6), rand_limbs((n_step,), 7))
    q = E.JPoint(rand_limbs((n_step,), 8), rand_limbs((n_step,), 9), rand_limbs((n_step,), 10))
    timeit("add_unsafe XLA (2048 pts)", jax.jit(lambda p, q: E.add_unsafe(E.BN254_CURVE, p, q)), p, q)
    timeit("add_unsafe pallas (2048 pts)",
           lambda p, q: PK.ec_add_unsafe_pallas(FQ_SPEC, tuple(p), tuple(q)), p, q)

    pb = E.JPoint(rand_limbs((n_big,), 11), rand_limbs((n_big,), 12), rand_limbs((n_big,), 13))
    qb = E.JPoint(rand_limbs((n_big,), 14), rand_limbs((n_big,), 15), rand_limbs((n_big,), 16))
    timeit("add_unsafe XLA (131072 pts)", jax.jit(lambda p, q: E.add_unsafe(E.BN254_CURVE, p, q)), p, q)
    timeit("add_unsafe pallas (131072 pts)",
           lambda p, q: PK.ec_add_unsafe_pallas(FQ_SPEC, tuple(p), tuple(q)), pb, qb)

    # launch overhead: 100 dependent tiny pallas montmuls
    @jax.jit
    def chain100(a, b):
        for _ in range(100):
            a = PK.montmul_pallas(FQ_SPEC, a, b)
        return a
    a3 = rand_limbs((512,), 17)
    b3 = rand_limbs((512,), 18)
    dt = timeit("chain of 100 pallas montmuls (33,512)", chain100, a3, b3, reps=3)
    print(f"  -> per-launch {dt/100*1e6:.1f} us")

    @jax.jit
    def chain100x(a, b):
        for _ in range(100):
            a = M.montmul(FQ_SPEC, a, b)
        return a
    dt = timeit("chain of 100 XLA montmuls (33,512)", chain100x, a3, b3, reps=3)
    print(f"  -> per-step {dt/100*1e6:.1f} us")

    # fori_loop body overhead at MSM scale: 64 steps of add_unsafe over 2048
    @jax.jit
    def fori_adds(p, q):
        def body(t, acc):
            return tuple(E.add_unsafe(E.BN254_CURVE, E.JPoint(*acc), q))
        return jax.lax.fori_loop(0, 64, body, tuple(p))
    dt = timeit("fori 64x add_unsafe XLA (2048)", fori_adds, p, q, reps=3)
    print(f"  -> per-step {dt/64*1e3:.2f} ms")


if __name__ == "__main__":
    main()
