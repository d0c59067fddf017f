"""Metric tests: SPARC properties, path lengths, evaluator protocol."""

import numpy as np
import pytest

import jax.numpy as jnp

from edmp_tpu.data import synthetic
from edmp_tpu.metrics import sparc as SP
from edmp_tpu.metrics.evaluator import Evaluator, orientation_error_deg
from edmp_tpu.robot.kinematics import ee_transform


def test_sparc_smooth_beats_jerky(rng):
    t = np.linspace(0, 1, 50)
    smooth = np.sin(np.pi * t) ** 2
    jerky = smooth + 0.35 * np.sin(40 * np.pi * t)
    s_smooth, _, _ = SP.sparc(smooth, fs=12.5)
    s_jerky, _, _ = SP.sparc(jerky, fs=12.5)
    assert s_smooth > s_jerky  # less negative = smoother


def test_sparc_scale_invariant():
    t = np.linspace(0, 1, 64)
    v = np.sin(np.pi * t) ** 2
    a, _, _ = SP.sparc(v, 12.5)
    b, _, _ = SP.sparc(10 * v, 12.5)
    assert a == pytest.approx(b, abs=1e-9)


def test_path_length_straight_line():
    q0 = np.zeros(7)
    q1 = np.full(7, 0.5)
    traj = q0 + np.linspace(0, 1, 20)[:, None] * (q1 - q0)
    jl, el = SP.path_length_metric(traj)
    assert jl == pytest.approx(np.linalg.norm(q1 - q0), rel=1e-5)
    # EE path length >= straight-line EE displacement
    p0 = np.asarray(ee_transform(jnp.asarray(q0, jnp.float32)))[:3, 3]
    p1 = np.asarray(ee_transform(jnp.asarray(q1, jnp.float32)))[:3, 3]
    assert el >= np.linalg.norm(p1 - p0) - 1e-5


def test_orientation_error():
    R = np.eye(3)
    th = np.radians(20)
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    assert orientation_error_deg(R, Rz) == pytest.approx(20.0, abs=1e-6)
    assert orientation_error_deg(R, R) == pytest.approx(0.0, abs=1e-4)


def test_evaluator_success_criteria(rng):
    ev = Evaluator(substeps=2, check_self_collision=False)
    goal = synthetic.random_joint_config(rng)[0]
    start = synthetic.random_joint_config(rng)[0]
    traj = start + (3 * np.linspace(0, 1, 30)[:, None] ** 2
                    - 2 * np.linspace(0, 1, 30)[:, None] ** 3) * (goal - start)
    target = np.asarray(ee_transform(jnp.asarray(goal, jnp.float32)), np.float64)
    empty = np.zeros((0, 10))
    r = ev.evaluate_trajectory(traj, target, empty)
    assert r.position_error < 0.01
    assert r.orientation_error < 15
    assert not r.env_collision and not r.joint_limit_violation
    assert r.success

    # a trajectory ending elsewhere fails the position criterion
    r2 = ev.evaluate_trajectory(traj[::-1].copy(), target, empty)
    assert not r2.success or np.allclose(start, goal, atol=1e-3)

    m = ev.metrics()
    assert m["num_problems"] == 2
    assert 0 <= m["success_rate"] <= 100


def test_evaluator_flags_collision(rng):
    ev = Evaluator(substeps=2, check_self_collision=False)
    giant = np.array([[0.0, 0.0, 0.5, 0, 0, 0, 1, 3.0, 3.0, 3.0]])
    goal = synthetic.random_joint_config(rng)[0]
    traj = np.linspace(np.zeros(7), goal, 10)
    target = np.asarray(ee_transform(jnp.asarray(goal, jnp.float32)), np.float64)
    r = ev.evaluate_trajectory(traj, target, giant)
    assert r.env_collision and not r.success


def test_self_collision_screen_passes_home():
    from edmp_tpu.metrics.evaluator import self_collision_free

    # the Franka ready/home pose (q=0 violates joint-4 limits and folds the
    # arm onto itself — the capsule model rightly flags it)
    home = np.array([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785])
    assert self_collision_free(home[None, :])


def test_evaluator_save_aggregate_and_skips(tmp_path):
    """Group save/aggregate + skip bookkeeping (mpinets/metrics.py:487-491,
    731-786): two saved runs merge into one aggregate with combined skip
    counts."""
    import jax.numpy as jnp

    from edmp_tpu import constants as C
    from edmp_tpu.metrics.evaluator import Evaluator
    from edmp_tpu.robot.kinematics import ee_transform

    q = 0.5 * (np.asarray(C.FRANKA_LOWER) + np.asarray(C.FRANKA_UPPER))
    T = np.asarray(ee_transform(jnp.asarray(q, jnp.float32)), np.float64)
    traj = np.tile(q, (3, 1))

    ev1 = Evaluator(substeps=2, check_self_collision=False)
    ev1.evaluate_trajectory(traj, T, np.zeros((0, 10)))
    ev1.record_skip(7, "no_ik_solution")
    ev1.save(str(tmp_path / "run1.json"))

    ev2 = Evaluator(substeps=2, check_self_collision=False)
    ev2.evaluate_trajectory(traj, T, np.zeros((0, 10)))
    ev2.evaluate_trajectory(traj, T + 0.5, np.zeros((0, 10)))  # a failure
    ev2.record_skip(9, "planner_error")
    ev2.save(str(tmp_path / "run2.json"))

    agg = Evaluator.from_files(
        [str(tmp_path / "run1.json"), str(tmp_path / "run2.json")],
        substeps=2, check_self_collision=False)
    m = agg.metrics()
    assert m["num_problems"] == 3
    assert m["num_skipped"] == 2
    assert m["skip_reasons"] == {"no_ik_solution": 1, "planner_error": 1}
    # success rate over the merged runs: 2 accurate poses, 1 off-target
    assert m["success_rate"] == pytest.approx(100.0 * 2 / 3)
