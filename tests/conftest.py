"""Test configuration: run JAX on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4.4), and use
a persistent compilation cache so repeat test runs skip XLA compiles.

IMPORTANT: this image boots an ``axon`` TPU plugin from sitecustomize.py
which calls ``jax.config.update("jax_platforms", "axon,cpu")`` in EVERY
python process — overriding the JAX_PLATFORMS env var. Setting the env var
is NOT enough; we must update jax.config after import (before any backend
is initialized) or every test compile silently goes to the TPU tunnel.
"""

import os
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (must come after the env setup above)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
