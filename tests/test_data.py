"""Dataset-layer tests: shim unpickling of reference-format pickles, packing,
cylinder boxing quirk, npz round trip."""

import pickle
import sys
import types

import numpy as np
import pytest

from edmp_tpu import constants as C
from edmp_tpu.data import problems as D


def _install_fake_geometrout():
    """Create geometrout/mpinets modules with the attribute layout the real
    pickles carry (center/dims/_pose._so3._quat wxyz, SE3 _xyz/_so3)."""
    geo_t = types.ModuleType("geometrout.transform")
    geo_p = types.ModuleType("geometrout.primitive")
    geo = types.ModuleType("geometrout")
    mp_t = types.ModuleType("mpinets.types")
    mp = types.ModuleType("mpinets")

    class SO3:
        def __init__(self, quat_wxyz):
            self._quat = np.asarray(quat_wxyz, np.float64)

    class SE3:
        def __init__(self, xyz, quat_wxyz):
            self._xyz = np.asarray(xyz, np.float64)
            self._so3 = SO3(quat_wxyz)

    class Cuboid:
        def __init__(self, center, dims, quat_wxyz):
            self.center = np.asarray(center, np.float64)
            self.dims = np.asarray(dims, np.float64)
            self._pose = SE3(center, quat_wxyz)

    class Cylinder:
        def __init__(self, center, radius, height, quat_wxyz):
            self.center = np.asarray(center, np.float64)
            self.radius = radius
            self.height = height
            self._pose = SE3(center, quat_wxyz)

    class PlanningProblem:
        def __init__(self, target, q0, obstacles):
            self.target = target
            self.q0 = q0
            self.obstacles = obstacles

    for cls, mod in [(SO3, geo_t), (SE3, geo_t), (Cuboid, geo_p),
                     (Cylinder, geo_p), (PlanningProblem, mp_t)]:
        cls.__module__ = mod.__name__
        cls.__qualname__ = cls.__name__
        setattr(mod, cls.__name__, cls)
    sys.modules.update({
        "geometrout": geo, "geometrout.transform": geo_t,
        "geometrout.primitive": geo_p, "mpinets": mp, "mpinets.types": mp_t,
    })
    return SE3, Cuboid, Cylinder, PlanningProblem


@pytest.fixture
def fake_pickle(tmp_path):
    SE3, Cuboid, Cylinder, PlanningProblem = _install_fake_geometrout()
    # wxyz quaternion for 90deg about z: (cos45, 0, 0, sin45)
    qz90 = (np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4))
    prob = PlanningProblem(
        target=SE3([0.4, 0.1, 0.5], qz90),
        q0=np.linspace(-0.5, 0.5, 7),
        obstacles=[
            Cuboid([0.5, 0.0, 0.3], [0.2, 0.3, 0.4], qz90),
            Cylinder([0.1, 0.2, 0.6], 0.05, 0.3, (1.0, 0, 0, 0)),
        ],
    )
    data = {
        "tabletop": {"task_oriented": [prob], "neutral_start": [prob],
                     "neutral_goal": []},
        "cubby": {"task_oriented": [], "neutral_start": [], "neutral_goal": []},
    }
    path = tmp_path / "fake_solvable_problems.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f)
    # remove the fake modules so unpickling MUST go through the shims
    for m in list(sys.modules):
        if m.startswith(("geometrout", "mpinets")):
            del sys.modules[m]
    return str(path)


def test_shim_unpickle_and_convert(fake_pickle):
    by_type = D.load_reference_pickle(fake_pickle)
    assert set(by_type) == {"tabletop", "cubby"}
    assert len(by_type["tabletop"]) == 2  # task_oriented + neutral_start
    p = by_type["tabletop"][0]
    assert p.obstacle_config.shape == (2, 10)
    # cuboid row: quat rolled wxyz->xyzw
    np.testing.assert_allclose(p.obstacle_config[0, 3:7],
                               [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)],
                               atol=1e-12)
    # cylinder boxed with dims (r, r, h) — reference quirk
    np.testing.assert_allclose(p.obstacle_config[1, 7:], [0.05, 0.05, 0.3])
    # target SE3 -> matrix
    np.testing.assert_allclose(p.target_pose[:3, 3], [0.4, 0.1, 0.5])
    R90 = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(p.target_pose[:3, :3], R90, atol=1e-9)
    np.testing.assert_allclose(p.q0, np.linspace(-0.5, 0.5, 7))


def test_packed_dataset_roundtrip(fake_pickle, tmp_path):
    by_type = D.load_reference_pickle(fake_pickle)
    ds = D.PackedDataset.from_problems(by_type["tabletop"])
    assert len(ds) == 2
    assert ds.obstacles.shape == (2, C.MAX_OBSTACLES, 10)
    assert ds.n_obstacles[0] == 2
    out = tmp_path / "packed.npz"
    ds.save(str(out))
    ds2 = D.PackedDataset.load(str(out))
    np.testing.assert_allclose(ds.obstacles, ds2.obstacles)
    np.testing.assert_allclose(ds.target, ds2.target)
    cfg = ds2.scene_obstacle_config(0)
    assert cfg.shape == (2, 10)


def test_by_scene_type_filter(fake_pickle):
    by_type = D.load_reference_pickle(fake_pickle)
    all_probs = [p for st in D.SCENE_TYPES if st in by_type
                 for p in by_type[st]]
    ds = D.PackedDataset.from_problems(all_probs)
    tt = ds.by_scene_type("tabletop")
    assert len(tt) == 2
    assert len(ds.by_scene_type("dresser")) == 0
