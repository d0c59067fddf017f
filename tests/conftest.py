"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic (mesh / psum / argmin selection) is validated here
without TPUs, per SURVEY.md §4; the same tests run unchanged on real slices.
Env vars must be set before jax is imported anywhere.
"""

import os

# Hard-set: the deployment environment pins JAX_PLATFORMS=axon (TPU tunnel)
# via sitecustomize; tests must not claim the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite compiles many small programs; caching
# makes repeat runs (CI/driver) several times faster.  Must be set via
# config.update — the env vars are consumed before conftest runs in this
# environment.
_cache = os.path.abspath(
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_test_cache"))
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
