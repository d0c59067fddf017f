"""Problem schema + packed, static-shape dataset layer.

The reference consumes MPiNets "solvable problems" pickles
(``datasets/load_test_dataset.py``): ``scene_type -> problem_type ->
[PlanningProblem]`` where each problem carries a 'right_gripper'-frame SE3
target, a start configuration q0, and geometrout Cuboid/Cylinder obstacles.

Here problems are ingested ONCE into packed fixed-shape numpy arrays
(obstacles padded to MAX_OBSTACLES, cylinders boxed exactly like
load_test_dataset.py:136-139) and stored as ``.npz`` so the TPU sweep never
touches Python object graphs.  ``load_reference_pickle`` unpickles the
original files without requiring geometrout/mpinets installs via shim
classes.
"""

from __future__ import annotations

import dataclasses
import io
import pickle
from typing import Dict, List, Sequence

import numpy as np

from edmp_tpu import constants as C

SCENE_TYPES = ("tabletop", "cubby", "merged_cubby", "dresser")
PROBLEM_TYPES = ("task_oriented", "neutral_start", "neutral_goal")

# Typed primitive-volume rows for the target-region protocol check
# (mpinets/types.py:41-45: target_volume is a Cuboid|Cylinder, the negative
# volumes any primitive).  Row layout (11,):
#   [type, center(3), quat_xyzw(4), p0, p1, p2]
# type 0 = absent, 1 = cuboid (p = dims), 2 = cylinder (p0 = radius,
# p1 = height), 3 = sphere (p0 = radius).
VOLUME_NONE, VOLUME_CUBOID, VOLUME_CYLINDER, VOLUME_SPHERE = 0, 1, 2, 3
MAX_NEGATIVE_VOLUMES = 8


def _empty_volume() -> np.ndarray:
    row = np.zeros(11)
    row[7] = 1.0  # identity quat
    return row


@dataclasses.dataclass
class Problem:
    """One planning problem in packed array form."""

    target_pose: np.ndarray       # (4, 4) 'right_gripper' SE3
    q0: np.ndarray                # (7,)
    obstacle_config: np.ndarray   # (n, 10): center, quat_xyzw, dims
    cuboid_config: np.ndarray     # (nc, 10) original cuboids
    cylinder_config: np.ndarray   # (ncy, 9): center, quat_xyzw, radius, height
    scene_type: str = "unknown"
    problem_type: str = "unknown"
    # target-region protocol data (mpinets/metrics.py:388-407): typed volume
    # rows; all-zero type means absent (pre-region datasets / synthetic)
    target_volume: np.ndarray = dataclasses.field(
        default_factory=_empty_volume)              # (11,)
    negative_volumes: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 11)))  # (m, 11)


# ---------------------------------------------------------------------------
# Reference-pickle ingestion (shim unpickler)
# ---------------------------------------------------------------------------

class _Shim:
    """Generic stand-in object: absorbs pickle state into attributes."""

    def __init__(self, *args, **kwargs):
        self._args = args
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple):
            for part in state:
                if isinstance(part, dict):
                    self.__dict__.update(part)


class _ShimUnpickler(pickle.Unpickler):
    """Resolve geometrout/mpinets classes to shims; numpy loads natively."""

    _LOCAL = ("geometrout", "mpinets")

    def find_class(self, module, name):
        if any(module.startswith(m) for m in self._LOCAL):
            return type(name, (_Shim,), {"__module__": module})
        return super().find_class(module, name)


def _get(obj, *names, default=None):
    for n in names:
        if hasattr(obj, n):
            return getattr(obj, n)
    return default


def _quat_wxyz(obj):
    """Extract a wxyz quaternion from a geometrout SO3-ish object."""
    q = _get(obj, "_quat", "quat", "q")
    if q is None:
        raise ValueError(f"cannot extract quaternion from {obj!r}")
    return np.asarray(list(q), dtype=np.float64)


def _se3_to_matrix(se3) -> np.ndarray:
    """geometrout SE3 -> 4x4 matrix (position + wxyz quaternion)."""
    m = _get(se3, "matrix")
    if m is not None and np.shape(m) == (4, 4):
        return np.asarray(m, np.float64)
    pos = _get(se3, "_xyz", "xyz", "pos", "position")
    so3 = _get(se3, "_so3", "so3", "rotation")
    qw = _quat_wxyz(so3)
    from edmp_tpu.costs.obstacles import _quat_xyzw_to_matrix

    R = _quat_xyzw_to_matrix(np.roll(qw, -1))  # wxyz -> xyzw
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = np.asarray(pos, np.float64)
    return T


def _pack_volume(obj) -> np.ndarray:
    """geometrout Cuboid/Cylinder/Sphere -> typed (11,) row; None -> absent."""
    row = _empty_volume()
    if obj is None:
        return row
    cls = type(obj).__name__

    def _center():
        c = _get(obj, "center", "_center")
        if c is None:
            c = _get(_get(obj, "_pose", "pose"), "_xyz", "xyz")
        return np.asarray(c, np.float64)

    def _quat():
        pose = _get(obj, "_pose", "pose")
        if pose is None:
            return np.array([0.0, 0.0, 0.0, 1.0])
        so3 = _get(pose, "_so3", "so3", default=pose)
        try:
            return np.roll(_quat_wxyz(so3), -1)
        except ValueError:
            return np.array([0.0, 0.0, 0.0, 1.0])

    if cls == "Cuboid":
        row[0] = VOLUME_CUBOID
        row[1:4] = _center()
        row[4:8] = _quat()
        row[8:11] = np.asarray(_get(obj, "dims", "_dims"), np.float64)
    elif cls == "Cylinder":
        row[0] = VOLUME_CYLINDER
        row[1:4] = _center()
        row[4:8] = _quat()
        row[8] = float(np.asarray(_get(obj, "radius", "_radius")))
        row[9] = float(np.asarray(_get(obj, "height", "_height")))
    elif cls == "Sphere":
        row[0] = VOLUME_SPHERE
        row[1:4] = _center()
        row[4:8] = np.array([0.0, 0.0, 0.0, 1.0])
        row[8] = float(np.asarray(_get(obj, "radius", "_radius")))
    return row


def problem_from_reference(p, scene_type="unknown", problem_type="unknown") -> Problem:
    """Convert an unpickled reference PlanningProblem to packed arrays.

    Mirrors datasets/load_test_dataset.py:92-150 exactly: quaternions stored
    wxyz in the pickles are rolled to xyzw; cylinders contribute a boxed
    obstacle row with dims (r, r, h) — note the reference uses the RADIUS,
    not the diameter, for the box footprint (load_test_dataset.py:136-139),
    a quirk kept for parity.
    """
    def _obs_quat_xyzw(obs):
        pose = _get(obs, "_pose", "pose")
        so3 = _get(pose, "_so3", "so3", default=pose)
        return np.roll(_quat_wxyz(so3), -1)  # wxyz -> xyzw, like :126

    def _obs_center(obs):
        # real geometrout pickles carry no 'center' attribute — center is a
        # PROPERTY over _pose._xyz, and shim objects only get raw state
        c = _get(obs, "center", "_center")
        if c is None:
            c = _get(_get(obs, "_pose", "pose"), "_xyz", "xyz")
        return np.asarray(c, np.float64)

    cuboids, cylinders = [], []
    for obs in (p.obstacles or []):
        cls = type(obs).__name__
        if cls == "Cuboid":
            center = _obs_center(obs)
            dims = np.asarray(_get(obs, "dims", "_dims"), np.float64)
            cuboids.append(np.concatenate([center, _obs_quat_xyzw(obs), dims]))
        elif cls == "Cylinder":
            center = _obs_center(obs)
            radius = float(np.asarray(_get(obs, "radius", "_radius")))
            height = float(np.asarray(_get(obs, "height", "_height")))
            cylinders.append(np.concatenate(
                [center, _obs_quat_xyzw(obs), [radius, height]]))

    cuboid_config = np.asarray(cuboids, np.float64).reshape(-1, 10)
    cylinder_config = np.asarray(cylinders, np.float64).reshape(-1, 9)
    rows = [cuboid_config]
    if len(cylinders):
        boxed = np.concatenate(
            [cylinder_config[:, :7],
             cylinder_config[:, 7:8],       # r
             cylinder_config[:, 7:8],       # r
             cylinder_config[:, 8:9]],      # h
            axis=1)
        rows.append(boxed)
    obstacle_config = np.concatenate(rows, axis=0) if rows else np.zeros((0, 10))

    negatives = [_pack_volume(v)
                 for v in (_get(p, "target_negative_volumes") or [])]
    return Problem(
        target_pose=_se3_to_matrix(p.target),
        q0=np.asarray(p.q0, np.float64).reshape(7),
        obstacle_config=obstacle_config,
        cuboid_config=cuboid_config,
        cylinder_config=cylinder_config,
        scene_type=scene_type,
        problem_type=problem_type,
        target_volume=_pack_volume(_get(p, "target_volume")),
        negative_volumes=np.asarray(negatives, np.float64).reshape(-1, 11),
    )


def load_reference_pickle(path: str) -> Dict[str, List[Problem]]:
    """Load a *_solvable_problems.pkl into {scene_type: [Problem, ...]}.

    Problems per scene type are flattened in the reference's order:
    task_oriented, neutral_start, neutral_goal (load_test_dataset.py:54-57).
    """
    with open(path, "rb") as f:
        data = _ShimUnpickler(io.BufferedReader(f)).load()
    out: Dict[str, List[Problem]] = {}
    for scene_type, by_problem in data.items():
        plist: List[Problem] = []
        for problem_type in PROBLEM_TYPES:
            for p in by_problem.get(problem_type, []):
                plist.append(problem_from_reference(p, scene_type, problem_type))
        out[scene_type] = plist
    return out


# ---------------------------------------------------------------------------
# Packed dataset (static shapes, npz on disk)
# ---------------------------------------------------------------------------

class PackedDataset:
    """Fixed-shape problem arrays for the device sweep.

    obstacles : (S, MAX_OBS, 10) raw configs (phantom rows zero)
    n_obstacles : (S,)
    q0 : (S, 7); target : (S, 4, 4)
    scene_type_id / problem_type_id : (S,) int indices into SCENE_TYPES etc.
    target_volume : (S, 11) typed region rows (type 0 = absent)
    negative_volumes : (S, MAX_NEGATIVE_VOLUMES, 11); n_negative : (S,)
    """

    def __init__(self, obstacles, n_obstacles, q0, target,
                 scene_type_id, problem_type_id,
                 target_volume=None, negative_volumes=None, n_negative=None):
        self.obstacles = np.asarray(obstacles, np.float32)
        self.n_obstacles = np.asarray(n_obstacles, np.int32)
        self.q0 = np.asarray(q0, np.float32)
        self.target = np.asarray(target, np.float32)
        self.scene_type_id = np.asarray(scene_type_id, np.int32)
        self.problem_type_id = np.asarray(problem_type_id, np.int32)
        S = self.q0.shape[0]
        if target_volume is None:
            target_volume = np.tile(_empty_volume(), (S, 1))
        if negative_volumes is None:
            negative_volumes = np.tile(_empty_volume(),
                                       (S, MAX_NEGATIVE_VOLUMES, 1))
        if n_negative is None:
            n_negative = np.zeros(S, np.int32)
        self.target_volume = np.asarray(target_volume, np.float32)
        self.negative_volumes = np.asarray(negative_volumes, np.float32)
        self.n_negative = np.asarray(n_negative, np.int32)

    def __len__(self):
        return self.q0.shape[0]

    @classmethod
    def from_problems(cls, problems: Sequence[Problem],
                      max_obstacles: int | None = None) -> "PackedDataset":
        max_obstacles = max_obstacles or C.MAX_OBSTACLES
        S = len(problems)
        obstacles = np.zeros((S, max_obstacles, 10), np.float64)
        obstacles[:, :, 6] = 1.0  # identity quat for padding rows
        n_obs = np.zeros(S, np.int32)
        q0 = np.zeros((S, 7))
        target = np.zeros((S, 4, 4))
        st = np.zeros(S, np.int32)
        pt = np.zeros(S, np.int32)
        tvol = np.tile(_empty_volume(), (S, 1))
        nvol = np.tile(_empty_volume(), (S, MAX_NEGATIVE_VOLUMES, 1))
        n_neg = np.zeros(S, np.int32)
        for i, p in enumerate(problems):
            n = p.obstacle_config.shape[0]
            if n > max_obstacles:
                raise ValueError(f"problem {i}: {n} obstacles > {max_obstacles}")
            obstacles[i, :n] = p.obstacle_config
            n_obs[i] = n
            q0[i] = p.q0
            target[i] = p.target_pose
            st[i] = SCENE_TYPES.index(p.scene_type) if p.scene_type in SCENE_TYPES else -1
            pt[i] = PROBLEM_TYPES.index(p.problem_type) if p.problem_type in PROBLEM_TYPES else -1
            tvol[i] = p.target_volume
            m = p.negative_volumes.shape[0]
            if m > MAX_NEGATIVE_VOLUMES:
                raise ValueError(
                    f"problem {i}: {m} negative volumes > {MAX_NEGATIVE_VOLUMES}")
            nvol[i, :m] = p.negative_volumes
            n_neg[i] = m
        return cls(obstacles, n_obs, q0, target, st, pt, tvol, nvol, n_neg)

    def scene_obstacle_config(self, i: int) -> np.ndarray:
        return self.obstacles[i, : self.n_obstacles[i]].astype(np.float64)

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, obstacles=self.obstacles, n_obstacles=self.n_obstacles,
            q0=self.q0, target=self.target, scene_type_id=self.scene_type_id,
            problem_type_id=self.problem_type_id,
            target_volume=self.target_volume,
            negative_volumes=self.negative_volumes, n_negative=self.n_negative)

    @classmethod
    def load(cls, path: str) -> "PackedDataset":
        with np.load(path) as z:
            # region arrays absent in pre-round-3 npz files -> defaults
            extra = {k: z[k] for k in
                     ("target_volume", "negative_volumes", "n_negative")
                     if k in z.files}
            return cls(z["obstacles"], z["n_obstacles"], z["q0"], z["target"],
                       z["scene_type_id"], z["problem_type_id"], **extra)

    def select(self, idx) -> "PackedDataset":
        idx = np.asarray(idx)
        return PackedDataset(self.obstacles[idx], self.n_obstacles[idx],
                             self.q0[idx], self.target[idx],
                             self.scene_type_id[idx], self.problem_type_id[idx],
                             self.target_volume[idx],
                             self.negative_volumes[idx], self.n_negative[idx])

    def by_scene_type(self, scene_type: str) -> "PackedDataset":
        return self.select(
            np.nonzero(self.scene_type_id == SCENE_TYPES.index(scene_type))[0])

    @classmethod
    def concatenate(cls, parts: Sequence["PackedDataset"]) -> "PackedDataset":
        """Stack datasets along the scene axis (obstacle padding widths may
        differ; the result pads to the widest)."""
        parts = list(parts)
        if not parts:
            raise ValueError("concatenate of zero datasets")
        o_max = max(p.obstacles.shape[1] for p in parts)

        def pad_obs(p):
            o = p.obstacles
            if o.shape[1] == o_max:
                return o
            pad = np.zeros((o.shape[0], o_max - o.shape[1], 10), o.dtype)
            pad[:, :, 6] = 1.0  # identity quat for padding rows
            return np.concatenate([o, pad], axis=1)

        return cls(
            np.concatenate([pad_obs(p) for p in parts]),
            np.concatenate([p.n_obstacles for p in parts]),
            np.concatenate([p.q0 for p in parts]),
            np.concatenate([p.target for p in parts]),
            np.concatenate([p.scene_type_id for p in parts]),
            np.concatenate([p.problem_type_id for p in parts]),
            np.concatenate([p.target_volume for p in parts]),
            np.concatenate([p.negative_volumes for p in parts]),
            np.concatenate([p.n_negative for p in parts]))


def convert_reference_dataset(pickle_path: str, out_path: str) -> PackedDataset:
    """One-shot ingestion: reference pickle -> packed npz."""
    by_type = load_reference_pickle(pickle_path)
    problems = [p for st in SCENE_TYPES if st in by_type for p in by_type[st]]
    ds = PackedDataset.from_problems(problems)
    ds.save(out_path)
    return ds
