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


def random_safe_joint_config(rng: np.random.Generator,
                             clearance: float = 0.005) -> np.ndarray:
    """A random in-limits configuration that is SELF-COLLISION-FREE on the
    capsule model.

    The real MPiNets 'solvable problems' carry expert-data start/goal
    configurations that never self-collide; a uniform draw over the joint
    box does ~30% of the time (measured round 4), which plants strict-
    protocol failures into the problem itself.  Rejection-samples until the
    min capsule clearance exceeds ``clearance``.
    """
    from edmp_tpu.robot.self_collision import min_pair_clearance

    for _ in range(200):
        q = random_joint_config(rng)[0]
        if min_pair_clearance(q[None]).min() > clearance:
            return q
    raise RuntimeError("rejection sampling failed (200 draws)")


def region_volumes_for_target(target_pose: np.ndarray,
                              box: float = 0.08, offset: float = 0.16):
    """Typed target/negative region rows for a synthetic problem.

    The MPiNets problems carry a ``target_volume`` the final EE must lie
    inside plus ``target_negative_volumes`` it must avoid — e.g. the right
    drawer of a dresser, not the one above it (mpinets/types.py:41-45,
    checked at mpinets/metrics.py:388-407).  Synthetic problems get the
    same shape of data so the protocol's region AND-term is exercised
    end-to-end: a ``box``-sized cuboid centred on the target position, and
    two cubby-style negative volumes stacked directly above and below it
    (the "wrong shelf" a badly-converged plan would reach into).

    Derived DETERMINISTICALLY from the target pose — no RNG draws — so
    datasets generated before this existed (e.g. the committed 128-scene v2
    protocol corpus, seed 0) reproduce scene-for-scene with region rows
    added.  Returns (target_volume (11,), negative_volumes (2, 11)).
    """
    p = np.asarray(target_pose, np.float64)[:3, 3]
    quat = np.array([0.0, 0.0, 0.0, 1.0])

    def cuboid_row(center):
        return np.concatenate([[1.0], center, quat, [box, box, box]])

    target = cuboid_row(p)
    negatives = np.stack([
        cuboid_row(p + np.array([0.0, 0.0, offset])),
        cuboid_row(p - np.array([0.0, 0.0, offset])),
    ])
    return target, negatives


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
    goal configuration are dropped, and start/goal configurations are
    rejection-sampled to be self-collision-free — the synthetic analogue of
    the MPiNets 'solvable problems' filtering, so success rates are
    meaningful.  (Before round 4 the generator drew start/goal uniformly;
    ~30% of uniform draws self-collide on the capsule model, planting
    strict-protocol failures into the problem itself.)
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
        if feasible:
            q0 = random_safe_joint_config(rng)
            goal = random_safe_joint_config(rng)
        else:
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
        tvol, nvol = region_volumes_for_target(target)
        problems.append(Problem(
            target_pose=target, q0=q0, obstacle_config=oc,
            cuboid_config=oc, cylinder_config=np.zeros((0, 9)),
            scene_type=SCENE_TYPES[i % len(SCENE_TYPES)],
            problem_type="task_oriented",
            target_volume=tvol, negative_volumes=nvol))
    return PackedDataset.from_problems(problems)


def hard_cubby_problem(rng: np.random.Generator, window_half: float = 0.13,
                       two_walls: bool = False, max_tries: int = 200):
    """One cubby/dresser-style NARROW-PASSAGE problem.

    Mimics the topology that makes the MPiNets cubby/dresser scenes hard
    (datasets: walled compartments between start and goal): a wall of boxes
    with a rectangular window stands between the robot and a target pose
    BEHIND the wall, so every successful plan must thread the window.
    ``window_half`` controls difficulty (smaller = harder);
    ``two_walls`` adds a second, offset-window wall (merged-cubby-like).

    Returns (obstacle_config, q0, q_goal) or None if no feasible layout was
    found (caller retries with a fresh rng draw).
    """
    from edmp_tpu.robot.kinematics import numpy_ee_transform
    from edmp_tpu.validation.oracle import TrajectoryOracle

    # C++ oracle for the feasibility checks: ~2000x the python fallback's
    # throughput, and the generator runs hundreds of candidate checks
    oracle = TrajectoryOracle()

    for _ in range(max_tries):
        # 1. goal configuration whose EE sits in a reachable shell
        q_goal = random_joint_config(rng)[0]
        p_g = numpy_ee_transform(q_goal)[:3, 3]
        r_xy = float(np.hypot(p_g[0], p_g[1]))
        if not (0.45 < r_xy < 0.75 and 0.15 < p_g[2] < 0.85):
            continue
        u = np.array([p_g[0], p_g[1], 0.0]) / r_xy      # wall normal (horiz.)
        v = np.array([-u[1], u[0], 0.0])                # wall tangent

        # 2. wall plane between base and goal; window where the shoulder->EE
        #    line crosses it
        d_wall = r_xy - rng.uniform(0.12, 0.2)
        # two-wall layouts need the INNER wall clear of the robot body
        # (second wall sits 0.13 m closer to the base)
        if d_wall < (0.48 if two_walls else 0.3):
            continue
        shoulder = np.array([0.0, 0.0, 0.35])
        ray = p_g - shoulder
        s = (d_wall - shoulder @ u) / max(ray @ u, 1e-6)
        if not (0.0 < s < 1.0):
            continue
        cross = shoulder + s * ray
        yw = float(cross @ v)
        zw = float(np.clip(cross[2], 0.2, 0.85))
        if abs(yw) > 0.45:
            continue

        def wall_rows(dist, yw, zw, w):
            """4 boxes forming a cabinet face with a (2w x 2w) window at
            (yw, zw).  CABINET-sized (like the MPiNets cubby shelves), not a
            full workspace wall: the arm must thread the window or swing
            around the cabinet — a full wall is impossible for the elbow."""
            ang = np.arctan2(u[1], u[0])
            quat = np.array([0.0, 0.0, np.sin(ang / 2), np.cos(ang / 2)])
            thick = 0.05
            y_ext = 0.42
            z_lo = max(0.05, zw - 0.32)
            z_hi = min(1.0, zw + 0.32)
            rows = []

            def box(yc, zc, ylen, zlen):
                if ylen <= 0.01 or zlen <= 0.01:
                    return
                center = u * dist + v * yc + np.array([0.0, 0.0, zc])
                rows.append(np.concatenate(
                    [center, quat, [thick, ylen, zlen]]))
            box((yw - w - y_ext) / 2, (z_lo + z_hi) / 2,
                (yw - w) - (-y_ext), z_hi - z_lo)          # left slab
            box((yw + w + y_ext) / 2, (z_lo + z_hi) / 2,
                y_ext - (yw + w), z_hi - z_lo)             # right slab
            box(yw, (zw + w + z_hi) / 2, 2 * w, z_hi - (zw + w))  # top
            box(yw, (z_lo + zw - w) / 2, 2 * w, (zw - w) - z_lo)  # bottom
            return rows

        rows = wall_rows(d_wall, yw, zw, window_half)
        if two_walls:
            # second wall closer to the base; its window sits where the
            # shoulder->EE ray crosses it (so the goal stays reachable) but
            # jittered off-axis — the path must dog-leg between openings
            d2 = d_wall - 0.13
            s2 = (d2 - shoulder @ u) / max(ray @ u, 1e-6)
            cross2 = shoulder + s2 * ray
            yw2 = float(cross2 @ v) + rng.choice([-1, 1]) * 0.05
            zw2 = float(np.clip(cross2[2] + rng.uniform(-0.05, 0.05),
                                0.2, 0.85))
            rows += wall_rows(d2, yw2, zw2, window_half + 0.03)
        oc = np.stack(rows)

        # 3. start on the near side, collision-free, line-of-motion blocked.
        # Home-ish starts (MPiNets neutral-start style) — fully random
        # near-limit configurations make every plan hard for reasons
        # unrelated to the narrow passage.
        home = np.array([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785])
        q0 = np.clip(home + rng.normal(0, 0.35, 7),
                     C.FRANKA_LOWER * 0.95, C.FRANKA_UPPER * 0.95)
        p_0 = numpy_ee_transform(q0)[:3, 3]
        if p_0 @ u > d_wall - 0.12:    # start EE must be on the near side
            continue
        if oracle.config_in_collision(q0, oc) \
                or oracle.config_in_collision(q_goal, oc):
            continue
        # the straight joint-space line must HIT the wall, else the scene
        # is trivial and won't separate the guides
        line = q0[None, :] + np.linspace(0, 1, 24)[:, None] * (q_goal - q0)
        if not any(oracle.config_in_collision(q, oc) for q in line[1:-1]):
            continue
        return oc, q0, q_goal
    return None


def hard_scene_dataset(rng: np.random.Generator, n_scenes: int,
                       window_half: float = 0.13,
                       two_walls_frac: float = 0.5):
    """PackedDataset of narrow-passage problems (see hard_cubby_problem).

    Scene types tag the family: 'cubby' = one wall, 'merged_cubby' = two
    offset walls.  Used by tools/ensemble_study.py to separate the guides
    (EDMP's core ensemble claim needs scenes where single-guide success
    drops well below ceiling)."""
    from edmp_tpu.data.problems import PackedDataset, Problem
    from edmp_tpu.robot.kinematics import numpy_ee_transform

    problems = []
    while len(problems) < n_scenes:
        two = rng.uniform() < two_walls_frac
        out = hard_cubby_problem(rng, window_half=window_half, two_walls=two)
        if out is None:
            continue
        oc, q0, q_goal = out
        target = numpy_ee_transform(q_goal)
        tvol, nvol = region_volumes_for_target(target)
        problems.append(Problem(
            target_pose=target, q0=q0,
            obstacle_config=oc, cuboid_config=oc,
            cylinder_config=np.zeros((0, 9)),
            scene_type="merged_cubby" if two else "cubby",
            problem_type="task_oriented",
            target_volume=tvol, negative_volumes=nvol))
    return PackedDataset.from_problems(problems)


def cluttered_scene_dataset(rng: np.random.Generator, n_scenes: int,
                            n_obstacles: int = 10,
                            offset_range=(0.06, 0.22)):
    """Hard CLUTTER problems: obstacles seeded along the straight start->goal
    joint-space sweep, so the direct path is blocked and plans must deform
    through clutter.  Unlike the wall/window family (hard_scene_dataset,
    which floors the synthetic-trained prior), clutter density scales
    difficulty smoothly — the knob the ensemble study needs.

    Obstacles are placed near the EE/elbow positions of interpolated
    waypoints with random offsets in ``offset_range``; obstacles touching
    the start or goal configuration are rejected (solvability filter, like
    the reference's 'solvable problems' sets).
    """
    from edmp_tpu.data.problems import PackedDataset, Problem
    from edmp_tpu.robot.kinematics import numpy_ee_transform
    from edmp_tpu.validation.oracle import TrajectoryOracle

    oracle = TrajectoryOracle()
    home = np.array([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785])

    problems = []
    while len(problems) < n_scenes:
        q0 = np.clip(home + rng.normal(0, 0.35, 7),
                     C.FRANKA_LOWER * 0.95, C.FRANKA_UPPER * 0.95)
        q_goal = random_joint_config(rng)[0]
        p_g = numpy_ee_transform(q_goal)[:3, 3]
        if not (0.35 < np.hypot(p_g[0], p_g[1]) < 0.75 and 0.1 < p_g[2] < 0.9):
            continue
        line = q0[None, :] + np.linspace(0.15, 0.85, 8)[:, None] * (q_goal - q0)
        anchors = np.stack([numpy_ee_transform(q)[:3, 3] for q in line])

        rows = []
        for _ in range(n_obstacles):
            a = anchors[rng.integers(len(anchors))]
            d = rng.normal(size=3)
            d /= np.linalg.norm(d)
            c = a + d * rng.uniform(*offset_range)
            c[2] = np.clip(c[2], 0.05, 1.1)
            dims = rng.uniform(0.06, 0.22, 3)
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            half = rng.uniform(0, np.pi) / 2
            quat = np.concatenate([axis * np.sin(half), [np.cos(half)]])
            row = np.concatenate([c, quat, dims])
            if oracle.config_in_collision(q0, row[None]) \
                    or oracle.config_in_collision(q_goal, row[None]):
                continue
            rows.append(row)
        if len(rows) < n_obstacles // 2:
            continue
        oc = np.stack(rows)
        # hardness filter: the straight joint-space line must be blocked
        dense = q0[None, :] + np.linspace(0, 1, 24)[:, None] * (q_goal - q0)
        if not any(oracle.config_in_collision(q, oc) for q in dense[1:-1]):
            continue
        target = numpy_ee_transform(q_goal)
        tvol, nvol = region_volumes_for_target(target)
        problems.append(Problem(
            target_pose=target, q0=q0,
            obstacle_config=oc, cuboid_config=oc,
            cylinder_config=np.zeros((0, 9)),
            scene_type="dresser", problem_type="task_oriented",
            target_volume=tvol, negative_volumes=nvol))
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
