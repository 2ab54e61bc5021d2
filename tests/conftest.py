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

# Persistent compilation cache: the suite is compile-heavy (many tiny-model
# program variants); repeat runs hit the cache and finish in ~1/5 the time.
jax.config.update("jax_compilation_cache_dir", "/tmp/fsodtf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
