"""Hand-derived gradient vs the autodiff engines: elementwise equality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edmp_tpu.costs import fast_guide as FG
from edmp_tpu.costs import grad_kernel as GK
from edmp_tpu.costs import guide as G
from edmp_tpu.costs.obstacles import obstacle_aabbs, pack_scene
from edmp_tpu.data import synthetic


def _setup(rng, B=8, N=10, n_obs=6):
    oc = synthetic.random_obstacle_config(rng, n_obs)
    scene = pack_scene(oc, max_obstacles=8)
    gp = G.GuideParams(
        clearance=jnp.full((B, 4), 0.08), expansion=jnp.full((B, 4), 0.15),
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


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_manual_matches_autodiff(seed):
    rng = np.random.default_rng(seed)
    joints, start, goal, lo, hi, gp = _setup(rng)
    ga = np.asarray(jax.jit(FG.guidance_gradient_fast)(joints, start, goal, lo, hi, gp))
    gm = np.asarray(jax.jit(GK.guidance_gradient_manual)(joints, start, goal, lo, hi, gp))
    scale = np.abs(ga).max() + 1e-8
    np.testing.assert_allclose(gm / scale, ga / scale, atol=3e-5)


def test_manual_per_sample_goal(rng):
    joints, start, _, lo, hi, gp = _setup(rng)
    B = joints.shape[0]
    goal = jnp.asarray(rng.uniform(-0.4, 0.4, (B, 7)), jnp.float32)
    ga = np.asarray(jax.jit(FG.guidance_gradient_fast)(joints, start, goal, lo, hi, gp))
    gm = np.asarray(jax.jit(GK.guidance_gradient_manual)(joints, start, goal, lo, hi, gp))
    scale = np.abs(ga).max() + 1e-8
    np.testing.assert_allclose(gm / scale, ga / scale, atol=3e-5)


def test_manual_jits(rng):
    joints, start, goal, lo, hi, gp = _setup(rng, B=4, N=6)
    f = jax.jit(GK.guidance_gradient_manual)
    g = f(joints, start, goal, lo, hi, gp)
    assert g.shape == joints.shape
    assert bool(jnp.all(jnp.isfinite(g)))
