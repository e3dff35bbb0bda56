"""Test harness: force a deterministic CPU JAX backend with 8 virtual devices
so multi-chip sharding tests run without TPU hardware (the driver separately
dry-runs the sharded path, and bench.py runs on the real chip)."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
