"""Test env: run JAX on CPU with 8 virtual devices so sharding/collective
tests work without TPU hardware (SURVEY.md §4 rebuild test strategy).

Note: the environment's sitecustomize imports jax and registers the TPU
plugin BEFORE this file runs, so env vars alone don't stick — we must use
jax.config. XLA_FLAGS is still read when the CPU client is instantiated,
which hasn't happened yet at collection time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
