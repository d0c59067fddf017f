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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
