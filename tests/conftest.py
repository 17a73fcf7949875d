"""Test config: force CPU with an 8-device virtual mesh (SURVEY §5.8).

The container pins JAX_PLATFORMS=axon (a tunneled real TPU); tests must NOT
use it — every eager op would pay a ~4ms network roundtrip. We force the
CPU backend with 8 virtual devices; multi-chip sharding tests run on that
mesh, and the driver's `dryrun_multichip` does the same. Real-TPU
benchmarking happens only in bench.py.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# rolled-CIOS montmul (identical math, ~30x smaller XLA graphs): XLA:CPU
# compile time dominates the suite; the loop-vs-unrolled equivalence is
# itself covered by test_modops.test_montmul_loop_mode_matches_unrolled,
# which clears the flag to trace the unrolled form.
os.environ.setdefault("WH2_MONTMUL_LOOP", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # single-split codegen: XLA:CPU's parallel LLVM codegen segfaults
    # intermittently in this container on the prover's montmul-heavy
    # graphs; serializing the backend compile avoids the race
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
if "xla_backend_optimization_level" not in flags:
    # the optimizing passes themselves are the other intermittent
    # SIGSEGV source on these graphs; tests run tiny shapes, so skip the
    # expensive LLVM work entirely (also ~3x faster cold compiles)
    flags = (flags + " --xla_backend_optimization_level=0"
             " --xla_llvm_disable_expensive_passes=true").strip()
os.environ["XLA_FLAGS"] = flags

import resource  # noqa: E402

# XLA:CPU's compiler threads inherit RLIMIT_STACK at creation; the
# prover's montmul-heavy graphs are deep enough to blow the default 8MB
# during backend compile (intermittent SIGSEGV in backend_compile_and_load).
# Raise the soft limit before jax spawns any compile threads.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 << 20
if _soft != resource.RLIM_INFINITY and (_hard == resource.RLIM_INFINITY
                                        or _hard >= _want):
    resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: the XLA persistent compilation cache is deliberately NOT enabled.
# In this container the XLA:CPU serialized executables are compiled with
# CPU features the host does not actually support ("Machine type used for
# XLA:CPU compilation doesn't match the machine type for execution ...
# could lead to execution errors such as SIGILL") and reloading them
# intermittently segfaults the test process. In-process caching +
# plonk/fused.py's global graph cache keep recompiles to one per shape
# per process.
