"""Elementwise parity of the fused Pallas guidance-gradient kernel against
the XLA engines (interpret mode on the CPU backend; the on-chip A/B lives in
bench.py --suite)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edmp_tpu import constants as C
from edmp_tpu.costs.grad_kernel import manual_guidance_gradient
from edmp_tpu.costs.guide import GuideParams, guidance_gradient
from edmp_tpu.costs.pallas_grad import (guidance_gradient_pallas,
                                        pallas_guidance_gradient)


def _rand_inputs(rng, B, N, O, near=True):
    lo = np.asarray(C.FRANKA_LOWER)
    hi = np.asarray(C.FRANKA_UPPER)
    joints = rng.uniform(lo * 0.8, hi * 0.8, (B, N, 7)).astype(np.float32)
    start = rng.uniform(lo * 0.8, hi * 0.8, 7).astype(np.float32)
    goal = rng.uniform(lo * 0.8, hi * 0.8, 7).astype(np.float32)
    # obstacle AABBs inside the reachable shell so overlaps actually happen
    if near:
        c = rng.uniform(-0.6, 0.6, (B, O, 3))
        c[..., 2] = rng.uniform(0.0, 0.9, (B, O))
    else:
        c = rng.uniform(5.0, 6.0, (B, O, 3))
    h = rng.uniform(0.05, 0.4, (B, O, 3))
    obs_lo = (c - h).astype(np.float32)
    obs_hi = (c + h).astype(np.float32)
    return joints, start, goal, obs_lo, obs_hi


@pytest.mark.parametrize("B,N,O,method", [
    (4, 10, 3, "mixed"),
    (2, 48, 24, "iv"),
    (3, 48, 7, "sv"),
])
def test_pallas_matches_manual(rng, B, N, O, method):
    joints, start, goal, obs_lo, obs_hi = _rand_inputs(rng, B, N, O)
    if method == "iv":
        m = np.zeros(B, np.float32)
    elif method == "sv":
        m = np.ones(B, np.float32)
    else:
        m = (np.arange(B) % 2).astype(np.float32)

    g_ref = manual_guidance_gradient(
        jnp.asarray(joints), jnp.asarray(start), jnp.asarray(goal),
        jnp.asarray(obs_lo), jnp.asarray(obs_hi), jnp.asarray(m))
    g_pl = pallas_guidance_gradient(
        jnp.asarray(joints), jnp.asarray(start), jnp.asarray(goal),
        jnp.asarray(obs_lo), jnp.asarray(obs_hi), jnp.asarray(m),
        interpret=True)
    assert np.any(np.asarray(g_ref) != 0.0)  # scene generates real overlap
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_matches_autodiff_engine(rng):
    """Full three-engine agreement incl. the grad_norm blend."""
    B, N, O = 4, 12, 5
    joints, start, goal, obs_lo, obs_hi = _rand_inputs(rng, B, N, O)
    m = (np.arange(B) % 2).astype(np.float32)
    gn = np.asarray([0, 1, 1, 0], np.float32)
    T = 8
    guide = GuideParams(
        clearance=jnp.zeros((B, T)), expansion=jnp.zeros((B, T)),
        guidance_method=jnp.asarray(m), grad_norm=jnp.asarray(gn),
        guidance_schedule=jnp.ones((B, T)))

    args = (jnp.asarray(joints), jnp.asarray(start), jnp.asarray(goal),
            jnp.asarray(obs_lo), jnp.asarray(obs_hi), guide)
    g_auto = guidance_gradient(*args)
    g_pl = guidance_gradient_pallas(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_auto),
                               atol=1e-5, rtol=1e-4)


def test_pallas_lane_padding(rng):
    """B not a multiple of the 128-lane block: padded lanes must not leak
    into the real gradient."""
    B, N, O = 5, 10, 4
    joints, start, goal, obs_lo, obs_hi = _rand_inputs(rng, B, N, O)
    m = np.ones(B, np.float32)
    g_ref = manual_guidance_gradient(
        jnp.asarray(joints), jnp.asarray(start), jnp.asarray(goal),
        jnp.asarray(obs_lo), jnp.asarray(obs_hi), jnp.asarray(m))
    g_pl = pallas_guidance_gradient(
        jnp.asarray(joints), jnp.asarray(start), jnp.asarray(goal),
        jnp.asarray(obs_lo), jnp.asarray(obs_hi), jnp.asarray(m),
        interpret=True)
    assert g_pl.shape == (B, N, 7)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)


def test_far_obstacles_zero_gradient(rng):
    joints, start, goal, obs_lo, obs_hi = _rand_inputs(rng, 2, 8, 3,
                                                       near=False)
    m = np.zeros(2, np.float32)
    g = pallas_guidance_gradient(
        jnp.asarray(joints), jnp.asarray(start), jnp.asarray(goal),
        jnp.asarray(obs_lo), jnp.asarray(obs_hi), jnp.asarray(m),
        interpret=True)
    np.testing.assert_array_equal(np.asarray(g), 0.0)
