"""Tests for the long-tail parity components: analysis utils, attention
blocks, interpolation/smoothness costs, SDF primitives, normalization,
environment facade."""

import numpy as np

import jax
import jax.numpy as jnp

from edmp_tpu.data import synthetic


def test_kl_divergence_gaussian_small_for_normal(rng):
    from edmp_tpu.diffusion.analysis import kl_divergence_against_gaussian

    x = rng.standard_normal(200_000)
    assert kl_divergence_against_gaussian(x) < 0.02
    assert kl_divergence_against_gaussian(x * 3 + 2) > 0.5


def test_gaussian_plot_limits_bracket_density(rng):
    """gaussian.py:37-46 parity: the returned x-range is where the density
    equals edge_factor * peak."""
    from edmp_tpu.diffusion.analysis import gaussian_pdf, gaussian_plot_limits

    mu, sigma = 1.5, 0.7
    lo, hi = gaussian_plot_limits(mu, sigma, edge_factor=0.01)
    peak = gaussian_pdf(mu, mu, sigma ** 2)
    np.testing.assert_allclose(gaussian_pdf(lo, mu, sigma ** 2), 0.01 * peak,
                               rtol=1e-6)
    np.testing.assert_allclose(gaussian_pdf(hi, mu, sigma ** 2), 0.01 * peak,
                               rtol=1e-6)
    assert lo < mu < hi


def test_multivariate_gaussian_pdf_grid():
    """gaussian.py:48-69 parity: k-dim isotropic grid density, peak at the
    grid point nearest the mean, correct normalization constant."""
    from edmp_tpu.diffusion.analysis import multivariate_gaussian_pdf

    pdf = multivariate_gaussian_pdf([0.0, 0.0], var=0.1, size=41,
                                    limits=(-1, 1))
    assert pdf.shape == (41, 41)
    peak = 1.0 / (2 * np.pi * 0.1)  # k=2 isotropic normalization
    np.testing.assert_allclose(pdf.max(), peak, rtol=1e-6)
    assert np.unravel_index(pdf.argmax(), pdf.shape) == (20, 20)


def test_swept_final_variant_zero_endpoints(rng):
    """lib/guide.py:539-595/:655-668 parity: the '_final' swept-volume
    variant hulls against ZERO-configuration endpoint rows (the reference
    never writes start/goal into them)."""
    from edmp_tpu.costs.guide import (best_trajectory_final, swept_volumes,
                                      swept_volumes_final)
    from edmp_tpu.costs.obstacles import obstacle_aabbs, pack_scene

    scene = pack_scene(
        np.array([[0.4, 0.0, 0.4, 0, 0, 0, 1, 0.4, 0.4, 0.4]]))
    obs_lo, obs_hi = obstacle_aabbs(scene)
    joints = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 6, 7)), jnp.float32)
    v_final = swept_volumes_final(joints, obs_lo, obs_hi)
    assert v_final.shape[1] == 7  # N+1 segments including both zero rows
    # equivalent to the regular swept cost with start = goal = zeros
    v_zero = swept_volumes(joints, jnp.zeros(7), jnp.zeros(7),
                           obs_lo, obs_hi)
    np.testing.assert_allclose(np.asarray(v_final), np.asarray(v_zero),
                               atol=1e-6)
    trajs = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 8, 7)), jnp.float32)
    best = best_trajectory_final(trajs, scene)
    assert best.shape == (8, 7)


def test_forward_diffuse_converges_to_gaussian(rng):
    from edmp_tpu.diffusion.analysis import forward_diffuse
    from edmp_tpu.diffusion.schedule import make_schedule

    sch = make_schedule(64)
    x0 = synthetic.smooth_trajectories(rng, 8, 20)
    chain, eps, kl = forward_diffuse(sch, x0, rng, condition=False)
    assert chain.shape == (65, 8, 20, 7)
    assert kl[-1] < kl[0]  # distribution approaches N(0,1)


def test_reverse_diffuse_inverts_forward(rng):
    from edmp_tpu.diffusion.analysis import forward_diffuse, reverse_diffuse
    from edmp_tpu.diffusion.schedule import make_schedule

    sch = make_schedule(16)
    x0 = synthetic.smooth_trajectories(rng, 2, 10)
    chain, eps, _ = forward_diffuse(sch, x0, rng, condition=False)
    rec = reverse_diffuse(sch, chain[-1], eps)
    np.testing.assert_allclose(rec[0], x0, atol=1e-8)


def test_attention_unet_forward():
    from edmp_tpu.models import temporal_unet as tu

    model = tu.TemporalUNet(input_dim=7, time_dim=8, dims=(8, 16),
                            use_attention=True)
    params = tu.init_params(jax.random.key(0), model, traj_len=12)
    y = model.apply({"params": params}, jnp.zeros((2, 12, 7)), jnp.ones(1))
    assert y.shape == (2, 12, 7)
    # attention params present
    assert "attn" in params["down_0"]
    assert tu.param_count(params) > 0


def test_interpolation_and_smoothness_costs(rng):
    from edmp_tpu.costs.guide import interpolation_volumes, smoothness_cost
    from edmp_tpu.costs.obstacles import obstacle_aabbs, pack_scene

    scene = pack_scene(synthetic.random_obstacle_config(rng, 3))
    lo, hi = obstacle_aabbs(scene)
    joints = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 6, 7)), jnp.float32)
    start = jnp.zeros(7)
    goal = jnp.ones(7) * 0.2
    vols = interpolation_volumes(joints, start, goal, lo, hi)
    assert vols.shape[:2] == (2, 7)  # N+1 segments
    c = smoothness_cost(joints, start, goal)
    assert float(c) >= 0
    # straight-line interior is smoother than shuffled interior
    line = start + jnp.linspace(0, 1, 8)[1:-1, None] * (goal - start)
    line = jnp.broadcast_to(line, (2, 6, 7))
    assert float(smoothness_cost(line, start, goal)) < float(c)


def test_sdf_primitives():
    from edmp_tpu.costs.sdf import (Cuboids, Cylinders, Spheres, scene_sdf,
                                    collision_hinge)

    cub = Cuboids.create([[0, 0, 0]], [[2, 2, 2]], [[0, 0, 0, 1]])
    pts = jnp.asarray([[0, 0, 0], [2, 0, 0], [1, 0, 0]], jnp.float32)
    d = cub.sdf(pts)
    np.testing.assert_allclose(np.asarray(d), [-1.0, 1.0, 0.0], atol=1e-6)

    sph = Spheres.create([[0, 0, 5]], [1.0])
    np.testing.assert_allclose(float(sph.sdf(jnp.zeros((1, 3)))[0]), 4.0,
                               atol=1e-6)

    cyl = Cylinders.create([[0, 0, 0]], [1.0], [2.0], [[0, 0, 0, 1]])
    d = cyl.sdf(jnp.asarray([[0, 0, 0], [0, 2, 0], [0, 0, 2]], jnp.float32))
    np.testing.assert_allclose(np.asarray(d), [-1.0, 1.0, 1.0], atol=1e-6)

    mixed = scene_sdf(pts, cuboids=cub, spheres=sph)
    assert mixed.shape == (3,)
    assert float(collision_hinge(d, margin=0.03)) > 0  # -1 inside -> hinge

    # zero-volume mask: padded primitives never contribute
    padded = Cuboids.create([[0, 0, 0], [0, 0, 0]], [[2, 2, 2], [0, 0, 0]],
                            [[0, 0, 0, 1]] * 2)
    np.testing.assert_allclose(np.asarray(padded.sdf(pts)),
                               np.asarray(cub.sdf(pts)), atol=1e-6)


def test_normalize_roundtrip(rng):
    from edmp_tpu.robot.normalize import normalize_joints, unnormalize_joints

    q = synthetic.random_joint_config(rng, 5)
    n = normalize_joints(q)
    assert np.all(n >= -1 - 1e-9) and np.all(n <= 1 + 1e-9)
    np.testing.assert_allclose(unnormalize_joints(n), q, atol=1e-9)


def test_environment_facade(rng):
    from edmp_tpu.environment import PlanningEnvironment

    env = PlanningEnvironment()
    env.go_home()
    assert not env.check_collisions()

    env.spawn_collision_cuboids(
        np.array([[0.0, 0.0, 0.5, 0, 0, 0, 1, 3.0, 3.0, 3.0]]))
    assert env.check_collisions()
    # reference layout (7, N) trajectory
    traj = np.zeros((7, 5))
    assert env.benchmark_trajectory(traj) == 0
    env.clear_obstacles()
    assert env.benchmark_trajectory(traj) == 1

    T = env.forward_kinematics(np.zeros(7))
    assert T.shape == (4, 4)
    J = env.get_jacobian(np.zeros(7))
    assert J.shape == (6, 7)
    # jacobian finite-difference check on position rows
    dq = 1e-4
    for i in range(7):
        qp = np.zeros(7)
        qp[i] += dq
        fd = (env.forward_kinematics(qp)[:3, 3] - T[:3, 3]) / dq
        np.testing.assert_allclose(J[:3, i], fd, atol=1e-3)

    # note: the home pose itself is outside the q4 limit, so aim at a
    # reachable target from a perturbed seed instead
    q_goal = synthetic.random_joint_config(rng)[0]
    T_goal = env.forward_kinematics(q_goal)
    q, err = env.inverse_kinematics(T_goal,
                                    q_init=q_goal + rng.normal(0, 0.05, 7))
    assert err < 1e-3
