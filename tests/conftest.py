"""Test harness: run everything on CPU with 8 virtual devices so the
multi-chip sharding path is exercised without TPU hardware (the pattern
recommended in SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell exports axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# This image's jax defaults jax_platforms to "axon,cpu" regardless of the
# env var, so pin the config value itself.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: the full-code decoder graphs take ~1 min
# each to compile on CPU; cache them across pytest runs.
from pathlib import Path  # noqa: E402

_cache = Path(__file__).parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from faid_tpu.code.qc_matrix import load_code  # noqa: E402


@pytest.fixture(scope="session")
def code():
    return load_code("50gpon")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
