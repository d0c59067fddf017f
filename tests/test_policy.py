"""Tests for the MPiNets policy baseline (L11): pointnet ops, robot surface
sampler, losses, training step, rollout, validation metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edmp_tpu import constants as C
from edmp_tpu.data.pointcloud import construct_mixed_point_cloud, policy_batch
from edmp_tpu.models.pointnet import (MPiNetsPointNet, ball_query,
                                      furthest_point_sample, group_points)
from edmp_tpu.models.policy import (MotionPolicyNetwork, collision_loss,
                                    init_policy, make_loss_fn,
                                    make_rollout_fn, make_train_step,
                                    point_match_loss, scene_primitives,
                                    validate_policy)
from edmp_tpu.robot.kinematics import link_box_frames
from edmp_tpu.robot.point_sampler import (CollisionSphereSampler,
                                          RobotPointSampler,
                                          build_fixed_points)


def _numpy_fps(xyz, n_samples):
    n = xyz.shape[0]
    idx = [0]
    d2 = np.full(n, np.inf)
    for _ in range(n_samples - 1):
        d2 = np.minimum(d2, np.sum((xyz - xyz[idx[-1]]) ** 2, axis=-1))
        idx.append(int(np.argmax(d2)))
    return np.asarray(idx)


def test_fps_matches_numpy(rng):
    xyz = rng.normal(size=(64, 3)).astype(np.float32)
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 8))
    want = _numpy_fps(xyz, 8)
    np.testing.assert_array_equal(got, want)
    assert got[0] == 0  # CUDA-kernel convention: first centroid is point 0


def test_ball_query_first_k_in_point_order():
    # center at origin; points 1, 3, 4 are within radius 0.5, in that order
    xyz = jnp.asarray([[5, 0, 0], [0.1, 0, 0], [9, 9, 9], [0, 0.2, 0],
                       [0.3, 0, 0], [7, 7, 7]], jnp.float32)
    centers = jnp.zeros((1, 3), jnp.float32)
    idx = np.asarray(ball_query(centers, xyz, 0.5, 5))[0]
    np.testing.assert_array_equal(idx, [1, 3, 4, 1, 1])  # fill = first hit


def test_ball_query_no_neighbors_is_zeros():
    xyz = jnp.full((4, 3), 10.0)
    idx = np.asarray(ball_query(jnp.zeros((1, 3)), xyz, 0.1, 3))
    np.testing.assert_array_equal(idx, np.zeros((1, 3)))


def test_group_points_centers_local_frame(rng):
    xyz = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(16, 2)), jnp.float32)
    centers = xyz[:3]
    idx = jnp.tile(jnp.arange(4)[None], (3, 1))
    g = group_points(xyz, feats, centers, idx)
    assert g.shape == (3, 4, 5)
    np.testing.assert_allclose(np.asarray(g[1, 2, :3]),
                               np.asarray(xyz[2] - centers[1]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g[0, 3, 3:]), np.asarray(feats[3]))


def test_pointnet_encoder_forward():
    model = MPiNetsPointNet()
    pc = jax.random.normal(jax.random.key(0), (2, 600, 4))
    params = model.init(jax.random.key(1), pc)
    out = model.apply(params, pc)
    assert out.shape == (2, 2048)
    assert np.all(np.isfinite(np.asarray(out)))


def test_fixed_points_lie_on_box_surfaces():
    local, ids = build_fixed_points(256)
    assert local.shape == (256, 3) and ids.shape == (256,)
    half = np.asarray(C.LINK_BOX_DIMS) / 2.0
    h = half[ids]
    # inside (or on) the box...
    assert np.all(np.abs(local) <= h + 1e-6)
    # ...and on a face: some |coordinate| equals its half-extent
    on_face = np.isclose(np.abs(local), h, atol=1e-6).any(axis=1)
    assert np.all(on_face)


def test_robot_sampler_follows_fk(rng):
    sampler = RobotPointSampler(num_points=64)
    q = jnp.asarray(rng.uniform(C.FRANKA_LOWER, C.FRANKA_UPPER), jnp.float32)
    pts = np.asarray(sampler(q))
    R, p = link_box_frames(q)
    R, p = np.asarray(R), np.asarray(p)
    ids = np.asarray(sampler._ids)
    local = np.asarray(sampler._local)
    want = np.einsum("nij,nj->ni", R[ids], local) + p[ids]
    np.testing.assert_allclose(pts, want, atol=1e-5)


def test_collision_spheres_inside_boxes():
    s = CollisionSphereSampler(spheres_per_link=3)
    q = jnp.zeros((7,), jnp.float32)
    centers = np.asarray(s(q))
    assert centers.shape == (27, 3)
    assert np.all(np.isfinite(centers))
    assert np.asarray(s.radii).min() > 0


def test_point_match_loss_zero_and_positive(rng):
    pc = jnp.asarray(rng.normal(size=(2, 32, 3)), jnp.float32)
    assert float(point_match_loss(pc, pc)) == 0.0
    assert float(point_match_loss(pc, pc + 0.1)) > 0.0


def _unit_scene_batch(B=1):
    """One axis-aligned unit cuboid at origin; padded cylinders."""
    batch = {
        "cuboid_centers": jnp.zeros((B, 1, 3)),
        "cuboid_dims": jnp.full((B, 1, 3), 1.0),
        "cuboid_quats": jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1, 1)),
        "cylinder_centers": jnp.zeros((B, 1, 3)),
        "cylinder_radii": jnp.zeros((B, 1, 1)),
        "cylinder_heights": jnp.zeros((B, 1, 1)),
        "cylinder_quats": jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1, 1)),
    }
    return batch


def test_collision_loss_hinge_semantics():
    batch = _unit_scene_batch()
    cub, cyl = scene_primitives(batch)
    far = jnp.full((1, 4, 3), 5.0)
    near = jnp.zeros((1, 4, 3))  # deep inside: sdf = -0.5
    assert float(collision_loss(far, cub, cyl)) == 0.0
    np.testing.assert_allclose(float(collision_loss(near, cub, cyl)),
                               0.53, atol=1e-5)  # margin 0.03 - (-0.5)


def test_collision_loss_gradient_finite_inside():
    """A point strictly inside a primitive used to backprop sqrt(0) = NaN
    through the SDF's clamped outside-distance norm — the bug that NaN'd
    policy training the moment a robot point penetrated an obstacle."""
    batch = _unit_scene_batch()
    cub, cyl = scene_primitives(batch)
    pts = jnp.asarray([[[0.0, 0.0, 0.0],        # box center (worst case)
                        [0.1, 0.0, 0.2],        # inside, off-center
                        [3.0, 0.0, 0.0]]])      # outside
    g = jax.grad(lambda p: collision_loss(p, cub, cyl))(pts)
    assert np.all(np.isfinite(np.asarray(g)))


def test_scene_primitives_mask_padded_rows():
    from edmp_tpu.costs import sdf as S

    batch = _unit_scene_batch()
    _, cyl = scene_primitives(batch)
    # zero-radius cylinder rows are masked -> huge sdf even at their center
    cyl0 = S.Cylinders(centers=cyl.centers[0], inv_rot=cyl.inv_rot[0],
                       radii=cyl.radii[0], half_h=cyl.half_h[0])
    sd = cyl0.sdf(jnp.zeros((2, 3)))
    assert float(sd.min()) > 1e6


def test_policy_forward_and_rollout(rng):
    model, params = init_policy(jax.random.key(0), num_points=600)
    xyz = jnp.asarray(rng.normal(size=(2, 600, 4)), jnp.float32)
    q = jnp.zeros((2, 7), jnp.float32)
    delta = model.apply({"params": params}, xyz, q)
    assert delta.shape == (2, 7)

    roll = make_rollout_fn(model, num_robot_points=128)
    traj = roll(params, xyz, q, 3)
    assert traj.shape == (4, 2, 7)
    assert np.all(np.abs(np.asarray(traj)) <= 1.0 + 1e-6)


def test_policy_train_step_improves(rng):
    batch = {k: jnp.asarray(v) for k, v in policy_batch(
        rng, 2, num_robot_points=128, num_obstacle_points=512,
        n_obstacles=3).items()}
    model, params = init_policy(jax.random.key(0),
                                num_points=int(batch["xyz"].shape[1]))
    # pure behavior-cloning objective at the reference lr (1e-4,
    # mpinets/model.py:72).  NOTE a real dynamics hazard of the reference's
    # hard clamp (model.py:202): at aggressive lr (1e-3) Adam overshoots all
    # joints into saturation, where the gradient is exactly zero and training
    # freezes — so the test sticks to the reference lr and checks the best
    # post-warmup loss beats the initial one (Adam is non-monotone).
    init_state, train_step = make_train_step(
        model, point_match_loss_weight=1.0, collision_loss_weight=0.0,
        num_robot_points=128, learning_rate=1e-4)
    state = init_state(params)
    step = jax.jit(train_step)
    logs = []
    for _ in range(6):
        state, log = step(state, batch)
        logs.append({k: float(v) for k, v in log.items()})
    assert all(np.isfinite(l["val_loss"]) for l in logs)
    assert min(l["point_match_loss"] for l in logs[1:]) < \
        logs[0]["point_match_loss"]
    assert int(state.step) == 6


def test_validate_policy_metrics(rng):
    batch = {k: jnp.asarray(v) for k, v in policy_batch(
        rng, 2, num_robot_points=128, num_obstacle_points=512,
        n_obstacles=2).items()}
    model, params = init_policy(jax.random.key(0),
                                num_points=int(batch["xyz"].shape[1]))
    metrics = validate_policy(model, params, batch, rollout_length=2,
                              num_robot_points=128)
    assert set(metrics) == {"avg_target_error", "avg_collision_rate"}
    assert np.isfinite(float(metrics["avg_target_error"]))
    assert 0.0 <= float(metrics["avg_collision_rate"]) <= 1.0


def test_policy_params_npz_roundtrip(tmp_path):
    """save_policy_params -> load_policy_params restores the exact pytree
    (the consumability contract for results_r4/policy_train checkpoints)."""
    import jax

    from edmp_tpu.models.policy import (init_policy, load_policy_params,
                                        save_policy_params)

    n_points = 64
    _, params = init_policy(jax.random.key(3), num_points=n_points)
    path = str(tmp_path / "p.npz")
    save_policy_params(params, path)
    loaded = load_policy_params(path, num_points=n_points)
    assert jax.tree_util.tree_structure(loaded) == \
        jax.tree_util.tree_structure(params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_build_fixed_points_rejects_too_few_points():
    from edmp_tpu.robot.point_sampler import build_fixed_points

    with pytest.raises(ValueError):
        build_fixed_points(num_points=5)


def test_empty_obstacle_config_gives_empty_cloud(rng):
    """Empty scenes must not plant origin points with the robot's
    segmentation id (reference returns an empty array)."""
    pc = construct_mixed_point_cloud(np.zeros((0, 10)), 128, rng=rng)
    assert pc.shape == (0, 4)


def test_construct_mixed_point_cloud_on_surfaces(rng):
    from edmp_tpu.costs.sdf import Cuboids

    oc = np.array([[0.0, 0, 0, 0, 0, 0, 1, 0.4, 0.4, 0.4],
                   [1.0, 1, 1, 0, 0, 0, 1, 0.2, 0.2, 0.2]])
    pc = construct_mixed_point_cloud(oc, 256, rng=rng)
    assert pc.shape == (256, 4)
    assert set(np.unique(pc[:, 3])) == {1.0, 2.0}
    cub = Cuboids.create(oc[:, :3], oc[:, 7:10], oc[:, 3:7])
    sd = np.asarray(cub.sdf(jnp.asarray(pc[:, :3])))
    np.testing.assert_allclose(sd, 0.0, atol=1e-5)


def test_train_policy_cli_smoke(tmp_path):
    from edmp_tpu.cli.train_policy import main

    rc = main(["--steps", "2", "--batch", "1", "--robot-points", "64",
               "--obstacle-points", "64", "--log-every", "1",
               "--validate-every", "2", "--rollout-length", "1",
               "--ckpt-dir", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "policy_params.npz").exists()


def test_loss_container_runs(rng):
    batch = {k: jnp.asarray(v) for k, v in policy_batch(
        rng, 2, num_robot_points=64, num_obstacle_points=128,
        n_obstacles=2).items()}
    model, params = init_policy(jax.random.key(0),
                                num_points=int(batch["xyz"].shape[1]))
    losses = make_loss_fn(model, num_points=64)(params, batch)
    assert np.isfinite(float(losses.collision))
    assert np.isfinite(float(losses.point_match))
