"""Equivalence of the lane-major cost engine with the readable engine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edmp_tpu.costs import fast_guide as FG
from edmp_tpu.costs import guide as G
from edmp_tpu.costs.obstacles import obstacle_aabbs, pack_scene
from edmp_tpu.data import synthetic


def _setup(rng, B=6, N=8, n_obs=5):
    oc = synthetic.random_obstacle_config(rng, n_obs)
    scene = pack_scene(oc)
    gp = G.GuideParams(
        clearance=jnp.full((B, 4), 0.05), expansion=jnp.zeros((B, 4)),
        guidance_method=jnp.asarray(rng.integers(0, 2, B), jnp.float32),
        grad_norm=jnp.asarray(rng.integers(0, 2, B), jnp.float32),
        guidance_schedule=jnp.ones((B, 4)),
    )
    lo, hi = obstacle_aabbs(scene, gp.expansion[:, 0], gp.clearance[:, 0])
    lo = jnp.broadcast_to(lo, (B,) + lo.shape[-2:])
    hi = jnp.broadcast_to(hi, (B,) + hi.shape[-2:])
    joints = jnp.asarray(rng.uniform(-0.9, 0.9, (B, N, 7)), jnp.float32)
    start = jnp.asarray(rng.uniform(-0.4, 0.4, 7), jnp.float32)
    goal = jnp.asarray(rng.uniform(-0.4, 0.4, 7), jnp.float32)
    return joints, start, goal, lo, hi, gp


def test_cost_matches_reference_engine(rng):
    joints, start, goal, lo, hi, gp = _setup(rng)
    a = float(G.blended_cost(joints, start, goal, lo, hi, gp.guidance_method))
    b = float(FG.blended_cost_fast(joints, start, goal, lo, hi,
                                   gp.guidance_method))
    assert b == pytest.approx(a, rel=1e-5, abs=1e-7)


def test_gradient_matches_reference_engine(rng):
    joints, start, goal, lo, hi, gp = _setup(rng)
    ga = np.asarray(G.guidance_gradient(joints, start, goal, lo, hi, gp))
    gb = np.asarray(FG.guidance_gradient_fast(joints, start, goal, lo, hi, gp))
    np.testing.assert_allclose(gb, ga, atol=2e-5, rtol=1e-4)


def test_gradient_matches_with_per_sample_goal(rng):
    joints, start, _, lo, hi, gp = _setup(rng)
    B = joints.shape[0]
    goal = jnp.asarray(rng.uniform(-0.4, 0.4, (B, 7)), jnp.float32)
    ga = np.asarray(G.guidance_gradient(joints, start, goal, lo, hi, gp))
    gb = np.asarray(FG.guidance_gradient_fast(joints, start, goal, lo, hi, gp))
    np.testing.assert_allclose(gb, ga, atol=2e-5, rtol=1e-4)


def test_fast_cost_jits(rng):
    joints, start, goal, lo, hi, gp = _setup(rng)
    f = jax.jit(FG.guidance_gradient_fast)
    g = f(joints, start, goal, lo, hi, gp)
    assert g.shape == joints.shape
    assert bool(jnp.all(jnp.isfinite(g)))
