"""Exact-SDF environment-clearance guidance term (costs/clearance.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edmp_tpu.costs import clearance as CL
from edmp_tpu.costs.obstacles import pack_scene


def _box_scene(center, dims, quat=(0, 0, 0, 1), max_obstacles=4):
    row = np.concatenate([np.asarray(center, float),
                          np.asarray(quat, float),
                          np.asarray(dims, float)])
    return pack_scene(row[None], max_obstacles=max_obstacles)


def test_oriented_box_sdf_exact_values():
    # unit cube at origin: outside along +x, inside at center
    scene = _box_scene([0, 0, 0], [1, 1, 1])
    pts = jnp.asarray([[1.0, 0.0, 0.0],    # 0.5 outside the +x face
                       [0.0, 0.0, 0.0],    # center: -0.5 inside
                       [1.0, 1.0, 0.0]])   # corner diagonal
    sdf = np.asarray(CL.oriented_box_sdf(pts, scene))
    assert sdf[0] == pytest.approx(0.5, abs=1e-6)
    assert sdf[1] == pytest.approx(-0.5, abs=1e-6)
    assert sdf[2] == pytest.approx(np.sqrt(2) * 0.5, abs=1e-6)


def test_oriented_box_sdf_rotation_not_aabb():
    # a thin wall rotated 45 deg about z: the ORIENTED sdf of a point on the
    # rotated face is small, while the world AABB would claim containment
    q = [0, 0, np.sin(np.pi / 8), np.cos(np.pi / 8)]  # 45deg about z
    scene = _box_scene([0, 0, 0], [0.05, 2.0, 2.0], quat=q)
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    p_on_normal = jnp.asarray([0.5 * c, 0.5 * s, 0.0])  # along wall normal
    sdf = float(CL.oriented_box_sdf(p_on_normal[None], scene)[0])
    assert sdf == pytest.approx(0.5 - 0.025, abs=1e-5)


def test_env_clearance_cost_zero_far_positive_near():
    far = _box_scene([5.0, 5.0, 5.0], [0.2, 0.2, 0.2])
    # q=0 is the fully-upright posture: a box enclosing the upper arm region
    near = _box_scene([0.0, 0.0, 0.7], [0.3, 0.3, 0.3])
    q = jnp.zeros((1, 3, 7), jnp.float32)  # home-ish posture near the base

    from edmp_tpu.costs.obstacles import stack_scenes, tile_scene_per_sample

    far_b = tile_scene_per_sample(stack_scenes([far]), 1)
    near_b = tile_scene_per_sample(stack_scenes([near]), 1)
    assert float(CL.env_clearance_cost(q, far_b)) == 0.0
    assert float(CL.env_clearance_cost(q, near_b)) > 0.0


def test_clearance_gradient_pushes_away():
    """The hinge gradient must INCREASE clearance when followed downhill."""
    scene = _box_scene([0.15, 0.0, 0.7], [0.3, 0.3, 0.3])
    from edmp_tpu.costs.obstacles import stack_scenes, tile_scene_per_sample

    scene_b = tile_scene_per_sample(stack_scenes([scene]), 1)
    q = jnp.zeros((1, 2, 7), jnp.float32)

    def cost(qq):
        return CL.env_clearance_cost(qq, scene_b)

    c0 = float(cost(q))
    assert c0 > 0.0
    g = jax.grad(cost)(q)
    q2 = q - 0.05 * g / (jnp.linalg.norm(g) + 1e-9)
    assert float(cost(q2)) < c0


def test_capsule_collision_implies_oracle_collision(rng):
    """The capsules are inscribed in the oracle's link boxes, so a negative
    capsule clearance (predicted env collision) must imply the C++ box
    oracle also reports a collision for that configuration."""
    from edmp_tpu.validation.oracle import TrajectoryOracle

    oracle = TrajectoryOracle()
    checked = 0
    for _ in range(200):
        center = rng.uniform(-0.6, 0.6, 3)
        center[2] = rng.uniform(0.1, 0.9)
        row = np.concatenate([center, [0, 0, 0, 1],
                              rng.uniform(0.1, 0.4, 3)])
        q = rng.uniform(-1.5, 1.5, 7)
        scene = pack_scene(row[None], max_obstacles=4)
        clear = float(CL.min_env_clearance(
            jnp.asarray(q, jnp.float32), scene))
        if clear < -1e-3:
            assert oracle.config_in_collision(q, row[None])
            checked += 1
        if checked >= 10:
            break
    assert checked >= 3  # the probe must actually exercise collisions


def test_make_clearance_update_elision_and_effect():
    from edmp_tpu.config import pack_ensemble, reference_guide_configs

    gp, _ = pack_ensemble(reference_guide_configs([1]), 2, 6)
    scene = _box_scene([0.15, 0.0, 0.7], [0.3, 0.3, 0.3])
    from edmp_tpu.costs.obstacles import stack_scenes, tile_scene_per_sample

    scene_b = tile_scene_per_sample(stack_scenes([scene]), 2)
    # weight None -> statically elided
    assert CL.make_clearance_update(gp, scene_b) is None
    gp_on = gp._replace(env_clearance_weight=jnp.full(2, 0.5, jnp.float32))
    upd = CL.make_clearance_update(gp_on, scene_b)
    x = jnp.zeros((2, 4, 7), jnp.float32)
    x2 = upd(x)
    assert x2.shape == x.shape
    # endpoints pinned (rows 0/-1 untouched), interior moved
    np.testing.assert_array_equal(np.asarray(x2[:, 0]), 0.0)
    np.testing.assert_array_equal(np.asarray(x2[:, -1]), 0.0)
    assert float(jnp.abs(x2[:, 1:-1]).max()) > 0.0
    # trust cap bounds the per-element move
    assert float(jnp.abs(x2 - x).max()) <= CL.ENV_STEP_CAP + 1e-7
