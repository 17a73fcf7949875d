"""Test config: force CPU with an 8-device virtual mesh (SURVEY §5.8).

The container pins JAX_PLATFORMS=axon (a tunneled real TPU); tests must NOT
use it — every eager op would pay a ~4ms network roundtrip. We force the
CPU backend with 8 virtual devices; multi-chip sharding tests run on that
mesh, and the driver's `dryrun_multichip` does the same. Real-TPU
benchmarking happens only in bench.py.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the big jitted pipelines (MSM, prover)
# compile once per shape across the whole test suite / repeated runs.
# Lives under artifacts/ (not /tmp) so it survives container restarts and
# pre-warms the driver's dryrun_multichip check.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "artifacts", "jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
