"""Test config: force CPU with an 8-device virtual mesh (SURVEY §5.8).

Multi-chip sharding is validated on virtual CPU devices; the driver's
`dryrun_multichip` does the same. Real-TPU benchmarking happens in bench.py.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
