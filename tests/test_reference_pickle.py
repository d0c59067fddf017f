"""Dataset-ingestion hardening: realistic reference-pickle round trip.

Builds pickle BYTES with the exact module paths and attribute layouts the
real MPiNets solvable-problem files carry (geometrout primitives store
``_pose``/``_dims``/``_radius``/``_height`` — ``center`` etc. are properties
that do NOT survive pickling; SO3 quats are wxyz; PlanningProblem is a plain
dataclass) and proves load_reference_pickle -> PackedDataset -> npz recovers
every field, including the reference loader's quirks:

  * wxyz -> xyzw quaternion roll (load_test_dataset.py:126,133)
  * cylinders boxed with dims (r, r, h) — radius, not diameter (:136-139)
  * problem-type flattening order task_oriented/neutral_start/neutral_goal
  * merged_cubby having a DIFFERENT problem count than cubby (the reference's
    ``data_nums['merged_cubby'] = len(cubby_data)`` copy-paste bug truncates
    or over-runs its sweep there, :62 — we load the true count and document
    the divergence)
"""

import pickle
import sys
import types

import numpy as np
import pytest

from edmp_tpu.costs.obstacles import _quat_xyzw_to_matrix
from edmp_tpu.data.problems import (PROBLEM_TYPES, SCENE_TYPES, PackedDataset,
                                    load_reference_pickle)


# --- fake geometrout/mpinets module tree producing REAL pickle layouts -----

def _register(mod_name, classes):
    # parent packages must exist in sys.modules for pickle's __import__
    parts = mod_name.split(".")
    for i in range(1, len(parts)):
        parent = ".".join(parts[:i])
        if parent not in sys.modules:
            pkg = types.ModuleType(parent)
            pkg.__path__ = []
            sys.modules[parent] = pkg
    mod = sys.modules.get(mod_name) or types.ModuleType(mod_name)
    for c in classes:
        c.__module__ = mod_name
        setattr(mod, c.__name__, c)
    sys.modules[mod_name] = mod
    setattr(sys.modules[".".join(parts[:-1])], parts[-1], mod)
    return mod


class SO3:
    def __init__(self, quat_wxyz):
        self._quat = np.asarray(quat_wxyz, np.float64)


class SE3:
    def __init__(self, xyz, quat_wxyz):
        self._xyz = np.asarray(xyz, np.float64)
        self._so3 = SO3(quat_wxyz)


class Cuboid:
    def __init__(self, center, dims, quat_wxyz):
        self._pose = SE3(center, quat_wxyz)
        self._dims = np.asarray(dims, np.float64)


class Cylinder:
    def __init__(self, center, radius, height, quat_wxyz):
        self._pose = SE3(center, quat_wxyz)
        self._radius = float(radius)
        self._height = float(height)


class PlanningProblem:
    def __init__(self, target, q0, obstacles):
        self.target = target
        self.target_volume = None
        self.q0 = np.asarray(q0, np.float64)
        self.obstacles = obstacles
        self.obstacle_point_cloud = None
        self.target_negative_volumes = []


class Sphere:  # appears in mpinets' Obstacles union; loader must skip it
    def __init__(self):
        self._pose = SE3(np.zeros(3), [1, 0, 0, 0])
        self._radius = 0.1


def _register_all():
    """(Re-)point the fake module tree at THIS file's classes — other test
    modules (tests/test_data.py) install their own fakes under the same
    module names, so registration must happen per-fixture, not per-import."""
    _register("geometrout.transform", [SO3, SE3])
    _register("geometrout.primitive", [Cuboid, Cylinder, Sphere])
    _register("mpinets.types", [PlanningProblem])


_register_all()


def _rand_quat_wxyz(r):
    q = r.normal(size=4)
    return q / np.linalg.norm(q)


def _make_problem(r, n_cuboids, n_cylinders):
    obstacles = []
    for _ in range(n_cuboids):
        obstacles.append(Cuboid(r.uniform(-1, 1, 3), r.uniform(0.05, 0.5, 3),
                                _rand_quat_wxyz(r)))
    for _ in range(n_cylinders):
        obstacles.append(Cylinder(r.uniform(-1, 1, 3), r.uniform(0.05, 0.3),
                                  r.uniform(0.1, 0.6), _rand_quat_wxyz(r)))
    target = SE3(r.uniform(-0.8, 0.8, 3), _rand_quat_wxyz(r))
    return PlanningProblem(target, r.uniform(-1.5, 1.5, 7), obstacles)


@pytest.fixture
def pickle_path(tmp_path, rng):
    _register_all()
    # per-scene-type problem counts; merged_cubby deliberately != cubby
    counts = {"tabletop": (2, 1, 1), "cubby": (1, 1, 0),
              "merged_cubby": (3, 2, 2), "dresser": (1, 0, 1)}
    data = {}
    for st, per_type in counts.items():
        data[st] = {
            pt: [_make_problem(rng, n_cuboids=2 + i, n_cylinders=i % 2)
                 for i in range(k)]
            for pt, k in zip(PROBLEM_TYPES, per_type)
        }
    path = tmp_path / "hybrid_solvable_problems.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path, data


def test_round_trip_recovers_everything(pickle_path, tmp_path):
    path, data = pickle_path
    by_type = load_reference_pickle(str(path))

    assert set(by_type) == set(SCENE_TYPES)
    # true counts, NOT the reference's merged_cubby:=cubby bug
    assert len(by_type["cubby"]) == 2
    assert len(by_type["merged_cubby"]) == 7

    # flattening order + field fidelity, checked against the source objects
    for st in SCENE_TYPES:
        src = [p for pt in PROBLEM_TYPES for p in data[st][pt]]
        assert len(by_type[st]) == len(src)
        for got, want in zip(by_type[st], src):
            np.testing.assert_allclose(got.q0, want.q0)
            # target SE3 -> matrix (wxyz quat -> rotation)
            R = _quat_xyzw_to_matrix(np.roll(want.target._so3._quat, -1))
            np.testing.assert_allclose(got.target_pose[:3, :3], R,
                                       atol=1e-12)
            np.testing.assert_allclose(got.target_pose[:3, 3],
                                       want.target._xyz)
            ncub = sum(type(o).__name__ == "Cuboid" for o in want.obstacles)
            ncyl = len(want.obstacles) - ncub
            assert got.cuboid_config.shape == (ncub, 10)
            assert got.cylinder_config.shape == (ncyl, 9)
            assert got.obstacle_config.shape == (ncub + ncyl, 10)
            for i, o in enumerate(w for w in want.obstacles
                                  if type(w).__name__ == "Cuboid"):
                row = got.obstacle_config[i]
                np.testing.assert_allclose(row[:3], o._pose._xyz)
                np.testing.assert_allclose(row[3:7],
                                           np.roll(o._pose._so3._quat, -1))
                np.testing.assert_allclose(row[7:], o._dims)
            for i, o in enumerate(w for w in want.obstacles
                                  if type(w).__name__ == "Cylinder"):
                row = got.obstacle_config[ncub + i]
                np.testing.assert_allclose(row[:3], o._pose._xyz)
                # the (r, r, h) boxing quirk: radius, not diameter
                np.testing.assert_allclose(row[7:],
                                           [o._radius, o._radius, o._height])

    # pack + npz round trip
    problems = [p for st in SCENE_TYPES for p in by_type[st]]
    ds = PackedDataset.from_problems(problems)
    out = tmp_path / "packed.npz"
    ds.save(str(out))
    ds2 = PackedDataset.load(str(out))
    assert len(ds2) == len(problems) == 15
    np.testing.assert_allclose(ds2.q0, ds.q0)
    np.testing.assert_allclose(ds2.obstacles, ds.obstacles)
    for i, p in enumerate(problems):
        np.testing.assert_allclose(ds2.scene_obstacle_config(i),
                                   p.obstacle_config, atol=1e-6)


def test_shim_survives_unknown_attributes(pickle_path, tmp_path, rng):
    """Future-proofing: extra attributes and nested unknown geometrout
    classes must not break ingestion."""
    path, _ = pickle_path
    p = _make_problem(rng, 1, 1)
    p.obstacles.append(Sphere())
    p.extra_field = {"nested": np.arange(3)}
    data = {st: {pt: ([p] if st == "tabletop" and pt == "task_oriented"
                      else [])
                 for pt in PROBLEM_TYPES} for st in SCENE_TYPES}
    path2 = tmp_path / "weird.pkl"
    with open(path2, "wb") as f:
        pickle.dump(data, f)
    by_type = load_reference_pickle(str(path2))
    got = by_type["tabletop"][0]
    assert got.obstacle_config.shape == (2, 10)  # sphere skipped, not fatal
