"""Cost-engine tests: hand-constructed scenes, finite-difference gradients,
per-sample hyperparameter semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edmp_tpu import constants as C
from edmp_tpu.costs import guide as G
from edmp_tpu.costs.obstacles import obstacle_aabbs, pack_scene


def box_cfg(center, dims, quat=(0, 0, 0, 1)):
    return np.concatenate([np.asarray(center, float), np.asarray(quat, float),
                           np.asarray(dims, float)])


def test_pack_scene_pads_with_phantoms():
    scene = pack_scene(np.stack([box_cfg([0.5, 0, 0.5], [0.2, 0.2, 0.2])]))
    assert scene.centers.shape == (C.MAX_OBSTACLES, 3)
    lo, hi = obstacle_aabbs(scene)
    np.testing.assert_allclose(np.asarray(lo)[0], [0.4, -0.1, 0.4], atol=1e-6)
    np.testing.assert_allclose(np.asarray(hi)[0], [0.6, 0.1, 0.6], atol=1e-6)
    # phantom entries are far outside the workspace
    assert np.all(np.asarray(lo)[1:, 0] > 1e3)


def test_rotated_obstacle_aabb():
    """45° z-rotated unit box has AABB half-extent sqrt(2)/2 in x/y."""
    s = np.sin(np.pi / 8)
    c = np.cos(np.pi / 8)
    scene = pack_scene(np.stack([box_cfg([0, 0, 0], [1, 1, 1], quat=(0, 0, s, c))]))
    lo, hi = obstacle_aabbs(scene)
    np.testing.assert_allclose(np.asarray(hi)[0, 0], np.sqrt(2) / 2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hi)[0, 2], 0.5, atol=1e-6)


def test_expansion_floor_and_clearance():
    """Expansion is an elementwise max floor; clearance is additive
    (lib/guide.py:133-136)."""
    scene = pack_scene(np.stack([box_cfg([0, 0, 0], [0.1, 0.5, 0.2])]))
    lo, hi = obstacle_aabbs(scene, expansion=jnp.asarray([0.3]),
                            clearance=jnp.asarray([0.05]))
    np.testing.assert_allclose(np.asarray(hi)[0, 0], [0.175, 0.275, 0.175], atol=1e-6)


def test_intersection_volume_known_value():
    """A configuration whose hand box overlaps a known obstacle."""
    scene = pack_scene(np.stack([box_cfg([0.088, 0, 1.0], [0.4, 0.4, 0.4])]))
    joints = jnp.zeros((1, 1, 7), jnp.float32)
    vols = G.intersection_volumes(joints, *obstacle_aabbs(scene))
    assert vols.shape == (1, 1, 9, C.MAX_OBSTACLES)
    assert float(jnp.sum(vols)) > 0.0
    # no overlap against the phantom obstacles
    assert float(jnp.sum(vols[..., 1:])) == 0.0


def test_no_obstacles_zero_cost():
    scene = pack_scene(np.zeros((0, 10)))
    joints = jnp.zeros((2, 5, 7), jnp.float32)
    vols = G.intersection_volumes(joints, *obstacle_aabbs(scene))
    assert float(jnp.sum(vols)) == 0.0


def test_swept_volume_catches_tunnelling():
    """Two waypoints on either side of a thin wall: intersection volume ~0 at
    the waypoints but the swept AABB hull overlaps the wall."""
    wall = pack_scene(np.stack([box_cfg([0.45, 0.0, 0.55], [0.01, 1.2, 0.8])]))
    qa = jnp.asarray([[0.9, 0.5, 0.0, -1.5, 0.0, 1.0, 0.0]], jnp.float32)
    qb = jnp.asarray([[-0.9, 0.5, 0.0, -1.5, 0.0, 1.0, 0.0]], jnp.float32)
    joints = jnp.stack([qa[0], qb[0]])[None]  # (1, 2, 7)
    lo, hi = obstacle_aabbs(wall)
    iv = float(jnp.sum(G.intersection_volumes(joints, lo, hi)))
    sv = float(jnp.sum(G.swept_volumes(joints, joints[0, 0], joints[0, 1], lo, hi)))
    assert sv > iv


def test_guidance_gradient_finite_difference(rng):
    scene = pack_scene(np.stack([box_cfg([0.4, 0.1, 0.6], [0.3, 0.3, 0.3]),
                                 box_cfg([0.2, -0.3, 0.4], [0.2, 0.4, 0.2])]))
    B, N = 4, 6
    joints = jnp.asarray(rng.uniform(-0.8, 0.8, (B, N, 7)), jnp.float32)
    start = jnp.zeros(7, jnp.float32)
    goal = jnp.asarray(rng.uniform(-0.5, 0.5, 7), jnp.float32)
    gp = G.GuideParams(
        clearance=jnp.full((B, 8), 0.05),
        expansion=jnp.zeros((B, 8)),
        guidance_method=jnp.asarray([0.0, 1.0, 0.0, 1.0]),
        grad_norm=jnp.zeros(B),
        guidance_schedule=jnp.ones((B, 8)),
    )
    lo, hi = obstacle_aabbs(scene, expansion=gp.expansion[:, 0],
                            clearance=gp.clearance[:, 0])
    g = np.asarray(G.guidance_gradient(joints, start, goal, lo, hi, gp))

    def cost_np(j):
        return float(G.blended_cost(jnp.asarray(j, jnp.float32), start, goal,
                                    lo, hi, gp.guidance_method))

    j0 = np.asarray(joints, np.float64)
    eps = 1e-3
    for _ in range(8):
        b, n, k = rng.integers(B), rng.integers(N), rng.integers(7)
        jp, jm = j0.copy(), j0.copy()
        jp[b, n, k] += eps
        jm[b, n, k] -= eps
        fd = (cost_np(jp) - cost_np(jm)) / (2 * eps)
        assert g[b, n, k] == pytest.approx(fd, abs=5e-3, rel=0.05)


def test_grad_norm_is_whole_tensor(rng):
    """grad_norm=1 samples are divided by the Frobenius norm of the WHOLE
    batch gradient (lib/guide.py:627-629)."""
    scene = pack_scene(np.stack([box_cfg([0.4, 0.0, 0.6], [0.5, 0.5, 0.5])]))
    B, N = 3, 4
    joints = jnp.asarray(rng.uniform(-0.6, 0.6, (B, N, 7)), jnp.float32)
    start = jnp.zeros(7, jnp.float32)
    goal = jnp.zeros(7, jnp.float32)
    base = G.GuideParams(
        clearance=jnp.zeros((B, 4)), expansion=jnp.zeros((B, 4)),
        guidance_method=jnp.zeros(B), grad_norm=jnp.zeros(B),
        guidance_schedule=jnp.ones((B, 4)),
    )
    lo, hi = obstacle_aabbs(scene)
    g_raw = np.asarray(G.guidance_gradient(joints, start, goal, lo, hi, base))
    normed = base._replace(grad_norm=jnp.asarray([1.0, 0.0, 1.0]))
    g_mix = np.asarray(G.guidance_gradient(joints, start, goal, lo, hi, normed))
    fro = np.linalg.norm(g_raw.ravel())
    np.testing.assert_allclose(g_mix[0], g_raw[0] / fro, rtol=1e-5)
    np.testing.assert_allclose(g_mix[1], g_raw[1], rtol=1e-5)


def test_best_trajectory_prefers_collision_free():
    wall = pack_scene(np.stack([box_cfg([0.45, 0.0, 0.55], [0.2, 1.0, 0.8])]))
    start = jnp.zeros(7, jnp.float32)
    goal = jnp.asarray([0.0, -0.6, 0.0, -2.0, 0.0, 1.2, 0.0], jnp.float32)
    # traj 0 swings through the wall region, traj 1 stays near home
    N = 10
    alphas = jnp.linspace(0, 1, N)[None, :, None]
    through = start + alphas * (jnp.asarray([1.6, 1.0, 0, -1.2, 0, 1.5, 0]) - start)
    safe = start + alphas * (goal - start)
    trajs = jnp.concatenate([through, safe], axis=0).astype(jnp.float32)
    idx = int(G.best_trajectory_index(trajs, start, goal, wall))
    costs = np.asarray(G.swept_cost_per_sample(trajs, start, goal, wall))
    assert idx == int(np.argmin(costs))


def test_ik_goal_volumes_shape():
    scene = pack_scene(np.stack([box_cfg([0.5, 0, 0.5], [0.3, 0.3, 0.3])]))
    goals = jnp.zeros((17, 7), jnp.float32)
    v = G.ik_goal_volumes(goals, scene)
    assert v.shape == (17,)
