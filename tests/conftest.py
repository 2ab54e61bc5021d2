"""Test env: run JAX on CPU with 8 virtual devices so sharding/collective
tests work without TPU hardware (SURVEY.md §4 rebuild test strategy)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
