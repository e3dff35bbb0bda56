"""Test harness: force a deterministic CPU JAX backend with 8 virtual devices
so multi-chip sharding tests run without TPU hardware (the driver separately
dry-runs the sharded path, and bench.py runs on the real chip).

Note: the environment's TPU plugin overrides JAX_PLATFORMS via
``jax.config.update`` at sitecustomize time, so env vars alone are not
enough — we re-update the config after import.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# SSE4.2 has no FMA instructions, so XLA:CPU rounds every mul/add separately,
# exactly like numpy — required for bitwise device-vs-oracle parity tests.
# (XLA:TPU is measured bit-exact without any flag; see specmath.)
if "xla_cpu_max_isa" not in flags:
    flags += " --xla_cpu_max_isa=SSE4_2"
os.environ["XLA_FLAGS"] = flags.strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
