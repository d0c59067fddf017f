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


def test_lane_major_swept_cost_matches_reference_engine(rng):
    """swept_cost_per_sample_fast == guide.swept_cost_per_sample on pinned
    trajectories (the planner's selection metric), shared AND per-sample
    scenes."""
    import jax.numpy as jnp

    from edmp_tpu.costs.grad_kernel import swept_cost_per_sample_fast
    from edmp_tpu.costs.guide import swept_cost_per_sample
    from edmp_tpu.costs.obstacles import pack_scene, tile_scene_per_sample

    B, N = 6, 12
    trajs = rng.uniform(-1.2, 1.2, (B, N, 7)).astype(np.float32)
    start = trajs[0, 0].copy()
    goal = trajs[0, -1].copy()
    trajs[:, 0] = start  # pinned endpoints, as the sampler guarantees
    trajs[:, -1] = goal
    scene = pack_scene(
        np.array([[0.4, 0.0, 0.4, 0, 0, 0, 1, 0.5, 0.6, 0.5],
                  [-0.3, 0.2, 0.6, 0, 0, 0, 1, 0.3, 0.3, 0.3]]),
        max_obstacles=4)
    want = np.asarray(swept_cost_per_sample(
        jnp.asarray(trajs[:, 1:-1]), jnp.asarray(start), jnp.asarray(goal),
        scene))
    got = np.asarray(swept_cost_per_sample_fast(jnp.asarray(trajs), scene))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)
    assert want.max() > 0  # the scene actually intersects

    per_sample = tile_scene_per_sample(
        jax.tree.map(lambda x: x[None], scene), B)  # (1*B, O, ...)
    got2 = np.asarray(swept_cost_per_sample_fast(jnp.asarray(trajs),
                                                 per_sample))
    np.testing.assert_allclose(got2, want, rtol=2e-5, atol=1e-7)
