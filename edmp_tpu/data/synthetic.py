"""Synthetic scenes and planning problems.

The real MPiNets pickles (global/hybrid/both solvable problems) are large
external artifacts (README.md:53-58); tests, benchmarks and smoke training
need self-contained problem generators with the same array schema:
obstacle_config rows ``[center(3), quat_xyzw(4), dims(3)]``
(datasets/load_test_dataset.py:150).
"""

from __future__ import annotations

import numpy as np

from edmp_tpu import constants as C


def random_obstacle_config(rng: np.random.Generator, n_obstacles: int,
                           workspace_radius: float = 0.9) -> np.ndarray:
    """Boxes scattered through the reachable workspace shell."""
    centers = rng.uniform(-workspace_radius, workspace_radius, (n_obstacles, 3))
    centers[:, 2] = rng.uniform(0.1, 1.0, n_obstacles)
    dims = rng.uniform(0.05, 0.35, (n_obstacles, 3))
    axis = rng.normal(size=(n_obstacles, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    half = rng.uniform(0, np.pi, n_obstacles) / 2
    quat = np.concatenate(
        [axis * np.sin(half)[:, None], np.cos(half)[:, None]], axis=1)
    return np.concatenate([centers, quat, dims], axis=1)


def random_joint_config(rng: np.random.Generator, n: int = 1,
                        margin: float = 0.1) -> np.ndarray:
    lo = C.FRANKA_LOWER * (1 - margin)
    hi = C.FRANKA_UPPER * (1 - margin)
    return rng.uniform(lo, hi, (n, 7))


def random_problem(rng: np.random.Generator, n_obstacles: int = 6,
                   n_ik_goals: int = 16):
    """A full synthetic planning problem.

    Returns (obstacle_config, start (7,), ik_goals (K,7), ik_valid (K,)).
    The candidate goals cluster around a common configuration the way the
    100-seed IK sweep does around one Cartesian target.
    """
    obstacle_config = random_obstacle_config(rng, n_obstacles)
    start = random_joint_config(rng)[0]
    goal_center = random_joint_config(rng)[0]
    ik_goals = goal_center[None, :] + rng.normal(0, 0.15, (n_ik_goals, 7))
    ik_goals = np.clip(ik_goals, C.FRANKA_LOWER, C.FRANKA_UPPER)
    n_valid = int(rng.integers(max(1, n_ik_goals // 2), n_ik_goals + 1))
    ik_valid = np.zeros(n_ik_goals, bool)
    ik_valid[:n_valid] = True
    return obstacle_config, start, ik_goals, ik_valid


def synthetic_packed_dataset(rng: np.random.Generator, n_scenes: int,
                             n_obstacles: int = 6, feasible: bool = True):
    """A PackedDataset of synthetic problems with FK-consistent targets.

    With ``feasible=True`` (default) obstacles that collide with the start or
    goal configuration are dropped — the synthetic analogue of the MPiNets
    'solvable problems' filtering, so success rates are meaningful.
    """
    from edmp_tpu.data.problems import PackedDataset, Problem, SCENE_TYPES
    from edmp_tpu.robot.kinematics import numpy_ee_transform

    oracle = None
    if feasible:
        from edmp_tpu.validation.oracle import TrajectoryOracle

        oracle = TrajectoryOracle()

    problems = []
    for i in range(n_scenes):
        oc = random_obstacle_config(rng, n_obstacles)
        q0 = random_joint_config(rng)[0]
        goal = random_joint_config(rng)[0]
        if oracle is not None:
            keep = [o for o in oc
                    if not (oracle.config_in_collision(q0, o[None])
                            or oracle.config_in_collision(goal, o[None]))]
            oc = (np.stack(keep) if keep else np.zeros((0, 10)))
        # host-side FK: eager jnp ops are pathologically slow on remote
        # (tunneled) backends — one tiny compile per op
        target = numpy_ee_transform(goal)
        problems.append(Problem(
            target_pose=target, q0=q0, obstacle_config=oc,
            cuboid_config=oc, cylinder_config=np.zeros((0, 9)),
            scene_type=SCENE_TYPES[i % len(SCENE_TYPES)],
            problem_type="task_oriented"))
    return PackedDataset.from_problems(problems)


def smooth_trajectories(rng: np.random.Generator, n: int,
                        traj_len: int = C.DEFAULT_TRAJ_LEN) -> np.ndarray:
    """Smooth random joint trajectories (B, N, 7) for training smoke tests:
    cubic blends between random start/goal pairs plus a low-frequency bump."""
    starts = random_joint_config(rng, n)
    goals = random_joint_config(rng, n)
    s = np.linspace(0.0, 1.0, traj_len)[None, :, None]
    blend = 3 * s**2 - 2 * s**3  # smoothstep
    base = starts[:, None, :] + blend * (goals - starts)[:, None, :]
    amp = rng.normal(0, 0.1, (n, 1, 7))
    bump = amp * np.sin(np.pi * s) ** 2 * rng.normal(0, 1, (n, 1, 7))
    return (base + bump).astype(np.float32)
