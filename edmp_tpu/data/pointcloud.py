"""Scene point clouds and policy training batches (host-side numpy).

Counterpart of ``mpinets/geometry.py:571-608`` (construct_mixed_point_cloud):
points sampled on obstacle surfaces, allocated per obstacle by surface area,
with a shuffled per-obstacle segmentation id in the 4th channel.

The MPiNets data *loader* is not part of the reference snapshot (only the
model/loss are, mpinets/model.py docstrings define the observation layout:
``[B, N, 4]`` xyz + segmentation, robot points FIRST so closed-loop rollouts
can overwrite them in place — mpinets/model.py:180-181).  ``policy_batch``
assembles that layout from this repo's synthetic scenes so the policy stack
is trainable end-to-end without the external dataset.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from edmp_tpu.robot.normalize import normalize_joints
from edmp_tpu.robot.point_sampler import RobotPointSampler, _box_surface_points


def _cuboid_surface(center, quat_xyzw, dims, n, rng):
    from edmp_tpu.costs.obstacles import _quat_xyzw_to_matrix

    local = _box_surface_points(np.asarray(dims) / 2.0, n, rng)
    R = _quat_xyzw_to_matrix(np.asarray(quat_xyzw))
    return local @ R.T + np.asarray(center)


def _cylinder_surface(center, quat_xyzw, radius, height, n, rng):
    from edmp_tpu.costs.obstacles import _quat_xyzw_to_matrix

    lateral = 2 * np.pi * radius * height
    caps = 2 * np.pi * radius ** 2
    n_lat = int(round(n * lateral / max(lateral + caps, 1e-12)))
    theta = rng.uniform(0, 2 * np.pi, n)
    pts = np.empty((n, 3))
    z = rng.uniform(-height / 2, height / 2, n_lat)
    pts[:n_lat] = np.stack([radius * np.cos(theta[:n_lat]),
                            radius * np.sin(theta[:n_lat]), z], axis=1)
    r = radius * np.sqrt(rng.uniform(0, 1, n - n_lat))
    side = np.where(rng.uniform(size=n - n_lat) < 0.5, -1.0, 1.0)
    pts[n_lat:] = np.stack([r * np.cos(theta[n_lat:]),
                            r * np.sin(theta[n_lat:]),
                            side * height / 2], axis=1)
    R = _quat_xyzw_to_matrix(np.asarray(quat_xyzw))
    return pts @ R.T + np.asarray(center)


def construct_mixed_point_cloud(cuboid_config: np.ndarray,
                                num_points: int,
                                cylinder_config: np.ndarray | None = None,
                                rng: np.random.Generator | None = None
                                ) -> np.ndarray:
    """(M1,10) cuboid rows [center, quat_xyzw, dims] (+ optional (M2,9)
    cylinder rows [center, quat_xyzw, radius, height]) -> (num_points, 4)
    surface samples with per-obstacle segmentation ids.

    Mirrors mpinets/geometry.py:571-608: allocation proportional to surface
    area (plus a 500-point floor before downsampling), shuffled ids 1..M.
    """
    rng = rng or np.random.default_rng(0)
    cuboid_config = np.asarray(cuboid_config).reshape(-1, 10)
    cylinder_config = (np.zeros((0, 9)) if cylinder_config is None
                       else np.asarray(cylinder_config).reshape(-1, 9))
    areas, samplers = [], []
    for row in cuboid_config:
        d = row[7:10]
        areas.append(2 * (d[0] * d[1] + d[1] * d[2] + d[0] * d[2]))
        samplers.append(lambda n, row=row: _cuboid_surface(
            row[:3], row[3:7], row[7:10], n, rng))
    for row in cylinder_config:
        r, h = row[7], row[8]
        areas.append(2 * np.pi * r * h + 2 * np.pi * r ** 2)
        samplers.append(lambda n, row=row: _cylinder_surface(
            row[:3], row[3:7], row[7], row[8], n, rng))
    if not samplers:
        # reference returns an empty array for empty scenes
        # (mpinets/geometry.py:571-608); num_points zero-rows would plant
        # phantom points at the origin carrying segmentation id 0 — the
        # ROBOT's id.  Callers needing fixed shapes must skip empty scenes.
        return np.zeros((0, 4), np.float32)
    areas = np.asarray(areas)
    props = areas / max(areas.sum(), 1e-12)
    ids = rng.permutation(len(samplers)) + 1
    chunks = []
    for sampler, prop, sid in zip(samplers, props, ids):
        n = int(prop * num_points) + 500
        pts = np.empty((n, 4))
        pts[:, :3] = sampler(n)
        pts[:, 3] = sid
        chunks.append(pts)
    points = np.concatenate(chunks)
    keep = rng.choice(points.shape[0], num_points, replace=False)
    return points[keep].astype(np.float32)


def policy_batch(rng: np.random.Generator, batch_size: int,
                 num_robot_points: int = 1024, num_obstacle_points: int = 1024,
                 n_obstacles: int = 4, max_cuboids: int = 8,
                 max_cylinders: int = 4) -> Dict[str, np.ndarray]:
    """A synthetic MPiNets training batch (mpinets/model.py:198-221 schema).

    xyz rows: [robot cloud at q (seg 0) | obstacle surface cloud (seg >= 1)];
    configuration/supervision are NORMALIZED joints; primitive arrays are
    zero-padded with wxyz quaternions (zero rows are masked by the SDFs).
    """
    from edmp_tpu.data.synthetic import (random_joint_config,
                                         random_obstacle_config)
    from edmp_tpu.robot.kinematics import numpy_ee_transform

    sampler = RobotPointSampler(num_robot_points)
    n_pts = num_robot_points + num_obstacle_points
    out = {
        "xyz": np.zeros((batch_size, n_pts, 4), np.float32),
        "configuration": np.zeros((batch_size, 7), np.float32),
        "supervision": np.zeros((batch_size, 7), np.float32),
        "target_position": np.zeros((batch_size, 3), np.float32),
        "cuboid_centers": np.zeros((batch_size, max_cuboids, 3), np.float32),
        "cuboid_dims": np.zeros((batch_size, max_cuboids, 3), np.float32),
        "cuboid_quats": np.zeros((batch_size, max_cuboids, 4), np.float32),
        "cylinder_centers": np.zeros((batch_size, max_cylinders, 3),
                                     np.float32),
        "cylinder_radii": np.zeros((batch_size, max_cylinders, 1), np.float32),
        "cylinder_heights": np.zeros((batch_size, max_cylinders, 1),
                                     np.float32),
        "cylinder_quats": np.zeros((batch_size, max_cylinders, 4), np.float32),
    }
    out["cuboid_quats"][..., 0] = 1.0  # identity wxyz for padded rows
    out["cylinder_quats"][..., 0] = 1.0
    for b in range(batch_size):
        oc = random_obstacle_config(rng, n_obstacles)[:max_cuboids]
        q = random_joint_config(rng)[0]
        step = rng.normal(0, 0.02, 7)
        out["configuration"][b] = normalize_joints(q)
        out["supervision"][b] = np.clip(normalize_joints(q + step), -1, 1)
        out["target_position"][b] = numpy_ee_transform(q + step)[:3, 3]
        robot_pc = np.asarray(sampler(np.asarray(q, np.float32)))
        out["xyz"][b, :num_robot_points, :3] = robot_pc
        out["xyz"][b, num_robot_points:] = construct_mixed_point_cloud(
            oc, num_obstacle_points, rng=rng)
        m = oc.shape[0]
        out["cuboid_centers"][b, :m] = oc[:, :3]
        out["cuboid_dims"][b, :m] = oc[:, 7:10]
        # synthetic rows carry xyzw; the batch schema is wxyz
        out["cuboid_quats"][b, :m] = np.roll(oc[:, 3:7], 1, axis=-1)
    return out


def target_region_cloud(position: np.ndarray, num_points: int,
                        rng: np.random.Generator,
                        radius: float = 0.03) -> np.ndarray:
    """Target-segment cloud: points on a small sphere at the goal position.

    MPiNets' observation carries the TARGET as its own point-cloud segment
    (the original pipeline renders gripper points at the goal pose; the
    reference snapshot ships only the model, whose docstring fixes the
    '3 geometric dims + segmentation mask' layout, mpinets/model.py:75-91).
    Without a target segment the policy is goal-blind — the round-4
    head-to-head's 0% traces partly to exactly that.  A sphere shell at the
    goal position with segmentation id 0.5 (distinct from robot 0 and
    obstacles >= 1) carries the same information without needing gripper
    meshes.
    """
    d = rng.normal(size=(num_points, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
    out = np.empty((num_points, 4), np.float32)
    out[:, :3] = np.asarray(position) + radius * d
    out[:, 3] = 0.5
    return out


class CorpusPolicyBatcher:
    """Behavior-cloning batches from a planner-distilled corpus
    (tools/distill.py shards + its scene pool).

    Each example is one (q_t -> q_{t+1}) step of a validated collision-free
    planner trajectory, with the MPiNets observation layout:
    ``[robot cloud at q_t (seg 0) | obstacle cloud (seg >= 1) | target
    sphere cloud (seg 0.5)]``; ``target_position`` is the EE position of the
    trajectory's FINAL waypoint.  Obstacle clouds are sampled once per scene
    and cached (the dominant host cost).
    """

    def __init__(self, corpus_dir: str, num_robot_points: int = 1024,
                 num_obstacle_points: int = 896,
                 num_target_points: int = 128,
                 max_cuboids: int = 16, seed: int = 0):
        import glob
        import os

        from edmp_tpu.data.problems import PackedDataset
        from edmp_tpu.robot.kinematics import numpy_ee_transform

        shards = sorted(glob.glob(os.path.join(corpus_dir, "trajs_*.npz")))
        if not shards:
            raise FileNotFoundError(f"no trajs_*.npz under {corpus_dir}")
        self.trajs = np.concatenate(
            [np.load(p)["trajectories"] for p in shards]).astype(np.float32)
        self.sids = np.concatenate([np.load(p)["scene_id"] for p in shards])
        self.scenes = PackedDataset.load(
            os.path.join(corpus_dir, "scenes.npz"))
        self.n_robot = num_robot_points
        self.n_obs = num_obstacle_points
        self.n_tgt = num_target_points
        self.max_cuboids = max_cuboids
        self.rng = np.random.default_rng(seed)
        self.sampler = RobotPointSampler(num_robot_points)
        self._cloud_cache: Dict[int, np.ndarray] = {}
        # goal EE position per trajectory (host FK, vectorized)
        self.goal_pos = np.stack(
            [numpy_ee_transform(t[-1])[:3, 3] for t in self.trajs]
        ).astype(np.float32)

    @property
    def num_points(self) -> int:
        return self.n_robot + self.n_obs + self.n_tgt

    def _obstacle_cloud(self, sid: int) -> np.ndarray:
        if sid not in self._cloud_cache:
            oc = self.scenes.scene_obstacle_config(int(sid))
            pc = construct_mixed_point_cloud(oc, self.n_obs, rng=self.rng)
            if len(pc) < self.n_obs:  # empty scene: pad FAR away, obstacle id
                pad = np.full((self.n_obs - len(pc), 4), 100.0, np.float32)
                pad[:, 3] = 1.0
                pc = np.concatenate([pc, pad]) if len(pc) else pad
            self._cloud_cache[int(sid)] = pc
        return self._cloud_cache[int(sid)]

    def batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        rng = self.rng
        n_pts = self.num_points
        out = {
            "xyz": np.zeros((batch_size, n_pts, 4), np.float32),
            "configuration": np.zeros((batch_size, 7), np.float32),
            "supervision": np.zeros((batch_size, 7), np.float32),
            "target_position": np.zeros((batch_size, 3), np.float32),
            "cuboid_centers": np.zeros((batch_size, self.max_cuboids, 3),
                                       np.float32),
            "cuboid_dims": np.zeros((batch_size, self.max_cuboids, 3),
                                    np.float32),
            "cuboid_quats": np.zeros((batch_size, self.max_cuboids, 4),
                                     np.float32),
            "cylinder_centers": np.zeros((batch_size, 1, 3), np.float32),
            "cylinder_radii": np.zeros((batch_size, 1, 1), np.float32),
            "cylinder_heights": np.zeros((batch_size, 1, 1), np.float32),
            "cylinder_quats": np.zeros((batch_size, 1, 4), np.float32),
        }
        out["cuboid_quats"][..., 0] = 1.0  # identity wxyz for padded rows
        out["cylinder_quats"][..., 0] = 1.0
        ti = rng.integers(0, len(self.trajs), batch_size)
        N = self.trajs.shape[1]
        wi = rng.integers(0, N - 1, batch_size)
        # robot clouds in one device call (RobotPointSampler is vmap-able)
        q_now = self.trajs[ti, wi]                        # (B, 7)
        q_next = self.trajs[ti, wi + 1]
        robot_pc = np.asarray(self.sampler(q_now))        # (B, P, 3)
        for b in range(batch_size):
            sid = int(self.sids[ti[b]])
            out["configuration"][b] = normalize_joints(q_now[b])
            out["supervision"][b] = np.clip(
                normalize_joints(q_next[b]), -1, 1)
            out["target_position"][b] = self.goal_pos[ti[b]]
            out["xyz"][b, :self.n_robot, :3] = robot_pc[b]
            out["xyz"][b, self.n_robot:self.n_robot + self.n_obs] = \
                self._obstacle_cloud(sid)
            out["xyz"][b, self.n_robot + self.n_obs:] = target_region_cloud(
                self.goal_pos[ti[b]], self.n_tgt, rng)
            oc = self.scenes.scene_obstacle_config(sid)[:self.max_cuboids]
            m = len(oc)
            out["cuboid_centers"][b, :m] = oc[:, :3]
            out["cuboid_dims"][b, :m] = oc[:, 7:10]
            out["cuboid_quats"][b, :m] = np.roll(oc[:, 3:7], 1, axis=-1)
        return out
