"""Validation-oracle tests: C++ core vs independent numpy SAT, and agreement
with the differentiable cost engine's collision signal."""

import numpy as np
import pytest

from edmp_tpu.data import synthetic
from edmp_tpu.validation import oracle as OR


@pytest.fixture(scope="module")
def oracle():
    return OR.TrajectoryOracle(substeps=4)


def test_library_builds(oracle):
    assert oracle is not None


def test_free_space_config(oracle):
    obs = np.array([[5.0, 5.0, 5.0, 0, 0, 0, 1, 0.2, 0.2, 0.2]])
    assert not oracle.config_in_collision(np.zeros(7), obs)


def test_obvious_collision(oracle):
    # giant box engulfing the robot
    obs = np.array([[0.0, 0.0, 0.5, 0, 0, 0, 1, 3.0, 3.0, 3.0]])
    assert oracle.config_in_collision(np.zeros(7), obs)


def test_cpp_matches_numpy_on_random_configs(oracle, rng):
    """The C++ radius-form SAT must agree with the numpy vertex-projection
    SAT on random configs/scenes."""
    mismatches = 0
    checked = 0
    for _ in range(40):
        obs = synthetic.random_obstacle_config(rng, 4)
        q = synthetic.random_joint_config(rng)[0]
        a = oracle.config_in_collision(q, obs)
        b = OR.python_config_in_collision(q, obs)
        checked += 1
        mismatches += int(a != b)
    assert mismatches == 0, f"{mismatches}/{checked} disagreements"


def test_trajectory_validation_matches_python(oracle, rng):
    agree = 0
    for _ in range(10):
        obs = synthetic.random_obstacle_config(rng, 3)
        traj = synthetic.smooth_trajectories(rng, 1, traj_len=12)[0]
        a, _ = oracle.validate(traj, obs)
        b = OR.python_validate_trajectory(traj, obs, substeps=4)
        agree += int(a == b)
    assert agree == 10


def test_substep_catches_tunnelling(oracle):
    """Two waypoints straddling a thin wall: per-waypoint check passes but
    substep interpolation must fail it."""
    wall = np.array([[0.45, 0.0, 0.55, 0, 0, 0, 1, 0.04, 2.0, 1.2]])
    qa = np.array([1.2, 0.6, 0.0, -1.2, 0.0, 1.4, 0.0])
    qb = np.array([-1.2, 0.6, 0.0, -1.2, 0.0, 1.4, 0.0])
    assert not oracle.config_in_collision(qa, wall)
    assert not oracle.config_in_collision(qb, wall)
    ok, seg = oracle.validate(np.stack([qa, qb]), wall)
    assert not ok and seg == 0


def test_batch_validation(oracle, rng):
    obs = synthetic.random_obstacle_config(rng, 4)
    trajs = synthetic.smooth_trajectories(rng, 6, traj_len=10)
    res = oracle.validate_batch(trajs, obs)
    assert res.shape == (6,)
    singles = np.array([oracle.validate(t, obs)[0] for t in trajs])
    np.testing.assert_array_equal(res, singles)


def test_no_obstacles_always_succeeds(oracle, rng):
    traj = synthetic.smooth_trajectories(rng, 1, traj_len=8)[0]
    ok, seg = oracle.validate(traj, np.zeros((0, 10)))
    assert ok and seg == -1
