"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices (the driver
separately dry-runs the multi-chip path); real-TPU perf is bench.py's job.
Must set flags before JAX initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
