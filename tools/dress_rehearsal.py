"""Real-artifact dress rehearsal: fake reference artifacts -> full pipeline.

The north-star acceptance run (released checkpoint + MPiNets pickles) is
environment-blocked, but nothing about the MECHANICS has to wait: this tool
fabricates byte-accurate fakes of both artifact kinds and drives the entire
convert -> sweep -> evaluate path end to end, so real-artifact day is a file
swap.

  1. ``TemporalUNetModel{T}_N{len}/weights_latest.pt``: a torch state_dict
     saved from the REFERENCE'S OWN TemporalUNet class
     (diffusion/models/temporalunet.py:78-100 format: exact key names,
     shapes, dtypes; plus losses.npy).  Randomly initialised — the point is
     the checkpoint plumbing, not the weights.
  2. ``{type}_solvable_problems.pkl``: the exact pickle schema of
     datasets/load_test_dataset.py:28-57 — dict scene_type -> problem_type
     -> [mpinets.types.PlanningProblem] with geometrout primitives
     (``_pose``/``_dims``/``_radius``/``_height`` attribute layouts, wxyz
     quaternions).  Targets are FK poses of random valid configurations so
     the IK goal sweep succeeds like it would on real 'solvable' problems.
  3. Runs ``cli.convert dataset`` on the pickle, then ``cli.infer`` with the
     checkpoint directory + converted npz + ``--evaluate``.

One command:  python -m tools.dress_rehearsal --workdir /tmp/rehearsal
CI coverage:  tests/test_dress_rehearsal.py (CPU, small sizes).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, os.pardir))
REF_PATH = "/root/reference"


# --- fake module tree matching the real pickles' import paths --------------
# (same layouts as tests/test_reference_pickle.py: geometrout primitives
# pickle their private attributes; properties do not survive pickling)

def _register(mod_name, classes):
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


def register_fake_modules():
    _register("geometrout.transform", [SO3, SE3])
    _register("geometrout.primitive", [Cuboid, Cylinder])
    _register("mpinets.types", [PlanningProblem])


# --- artifact fabricators --------------------------------------------------

def fabricate_checkpoint(models_dir: str, T: int = 255, traj_len: int = 50,
                         seed: int = 0) -> str:
    """Write ``<models_dir>/TemporalUNetModel{T}_N{traj_len}/
    weights_latest.pt`` + ``losses.npy`` in the reference's exact format, by
    saving the reference's own torch module's state_dict."""
    import torch

    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    # the reference imports torchvision only for tvtf.crop; shim if absent
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        fn = types.ModuleType("torchvision.transforms.functional")
        fn.crop = lambda img, top, left, h, w: img[..., top:top + h,
                                                   left:left + w]
        tv.transforms, tr.functional = tr, fn
        sys.modules.update({"torchvision": tv, "torchvision.transforms": tr,
                            "torchvision.transforms.functional": fn})
    from diffusion.models.temporalunet import TemporalUNet

    model_dir = os.path.join(models_dir, f"TemporalUNetModel{T}_N{traj_len}")
    # create only the PARENT: the reference ctor mkdirs a fresh model dir
    # itself and AUTO-LOADS from an existing one (temporalunet.py:39-44) —
    # pre-creating it would route construction through load()
    os.makedirs(models_dir, exist_ok=True)
    if os.path.isdir(model_dir) and not os.path.exists(
            os.path.join(model_dir, "losses.npy")):
        os.rmdir(model_dir)  # half-made dir from an aborted run
    torch.manual_seed(seed)
    net = TemporalUNet(model_dir, 7, 32, "cpu", (32, 64, 128, 256, 512, 512))
    torch.save(net.state_dict(), os.path.join(model_dir,
                                              "weights_latest.pt"))
    np.save(os.path.join(model_dir, "losses.npy"), np.zeros(1))
    return model_dir


def _reachable_target(rng):
    """FK pose of a random in-limits configuration, as a wxyz SE3 — the
    'solvable' guarantee the real datasets carry."""
    from edmp_tpu import constants as C
    from edmp_tpu.robot.kinematics import numpy_ee_transform

    lo = np.asarray(C.FRANKA_LOWER) * 0.9
    hi = np.asarray(C.FRANKA_UPPER) * 0.9
    q = lo + rng.uniform(0.1, 0.9, 7) * (hi - lo)
    T = numpy_ee_transform(q)
    # rotation matrix -> wxyz quaternion (Shepperd)
    R = T[:3, :3]
    w = np.sqrt(max(1.0 + R[0, 0] + R[1, 1] + R[2, 2], 0.0)) / 2.0
    if w > 1e-6:
        quat = [w, (R[2, 1] - R[1, 2]) / (4 * w),
                (R[0, 2] - R[2, 0]) / (4 * w),
                (R[1, 0] - R[0, 1]) / (4 * w)]
    else:
        quat = [1.0, 0.0, 0.0, 0.0]
    return SE3(T[:3, 3], quat), q


def fabricate_pickle(out_dir: str, dataset_type: str = "global",
                     n_per_cell: int = 1, seed: int = 0) -> str:
    """Write ``<out_dir>/{type}_solvable_problems.pkl`` with the full
    scene-type x problem-type grid (load_test_dataset.py:28-57 schema)."""
    register_fake_modules()
    rng = np.random.default_rng(seed)
    scene_types = ["tabletop", "cubby", "merged_cubby", "dresser"]
    problem_types = ["task_oriented", "neutral_start", "neutral_goal"]

    def problem():
        target, q_goal = _reachable_target(rng)
        obstacles = []
        # obstacles away from the workspace center keep the fakes solvable
        for _ in range(int(rng.integers(1, 4))):
            c = rng.uniform(0.4, 0.9, 3) * rng.choice([-1, 1], 3)
            obstacles.append(Cuboid(c, rng.uniform(0.05, 0.25, 3),
                                    [1.0, 0, 0, 0]))
        if rng.random() < 0.5:
            c = rng.uniform(0.4, 0.9, 3) * rng.choice([-1, 1], 3)
            obstacles.append(Cylinder(c, rng.uniform(0.05, 0.15),
                                      rng.uniform(0.1, 0.4), [1.0, 0, 0, 0]))
        q0 = np.zeros(7)
        q0[3], q0[5] = -1.5, 1.5
        return PlanningProblem(target, q0, obstacles)

    data = {st: {pt: [problem() for _ in range(n_per_cell)]
                 for pt in problem_types} for st in scene_types}
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{dataset_type}_solvable_problems.pkl")
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path


# --- the rehearsal ---------------------------------------------------------

def run(workdir: str, T: int = 255, traj_len: int = 50, n_per_cell: int = 1,
        scenes_per_batch: int = 4, seed: int = 0,
        sampler: str = "ddpm", ddim_steps: int = 32,
        guide_ids=(1, 2, 10, 11), batch_per_guide: int = 5) -> dict:
    """Fabricate artifacts, then convert + infer --evaluate end to end.
    Returns the sweep summary dict."""
    import json
    import yaml

    from edmp_tpu.cli import convert as cv_cli
    from edmp_tpu.cli import infer as infer_cli
    from edmp_tpu.config import write_guide_yamls

    os.makedirs(workdir, exist_ok=True)
    model_dir = fabricate_checkpoint(os.path.join(workdir, "models"),
                                     T=T, traj_len=traj_len, seed=seed)
    pkl = fabricate_pickle(os.path.join(workdir, "datasets"), "global",
                           n_per_cell=n_per_cell, seed=seed)
    print(f"fabricated {model_dir} and {pkl}", flush=True)

    # convert the pickle exactly as real-artifact day would
    npz = os.path.join(workdir, "global.npz")
    assert cv_cli.main(["dataset", pkl, npz]) in (0, None)

    write_guide_yamls(os.path.join(workdir, "guides"), list(guide_ids))
    cfg = {
        "guide": {"guides": list(guide_ids),
                  "batch_size_per_guide": batch_per_guide,
                  "guide_path": os.path.join(workdir, "guides")},
        "dataset": {"path": os.path.join(workdir, "datasets") + "/",
                    "dataset_type": "global",
                    "scene_types": ["tabletop", "cubby", "merged_cubby",
                                    "dresser"]},
        "model": {"model_dir": os.path.join(workdir, "models"),
                  "T": T, "traj_len": traj_len, "num_channels": 7},
        "general": {"save_dir": os.path.join(workdir, "results")},
    }
    cfg_path = os.path.join(workdir, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    rc = infer_cli.main(["-c", cfg_path, "--dataset-npz", npz,
                         "--scenes-per-batch", str(scenes_per_batch),
                         "--results-dir", cfg["general"]["save_dir"],
                         "--tag", "rehearsal", "--evaluate",
                         "--sampler", sampler,
                         "--ddim-steps", str(ddim_steps)])
    assert rc in (0, None), f"infer exited {rc}"
    spool = os.path.join(cfg["general"]["save_dir"],
                         "sweep_rehearsal.jsonl")
    n = sum(1 for _ in open(spool))
    print(f"rehearsal complete: {n} scenes spooled at {spool}")
    return {"model_dir": model_dir, "pickle": pkl, "npz": npz,
            "spool": spool, "n_scenes": n}


def main(argv=None):
    ap = argparse.ArgumentParser(prog="dress_rehearsal")
    ap.add_argument("--workdir", default="/tmp/rehearsal")
    ap.add_argument("--T", type=int, default=255)
    ap.add_argument("--traj-len", type=int, default=50)
    ap.add_argument("--n-per-cell", type=int, default=1,
                    help="problems per (scene_type, problem_type) cell")
    ap.add_argument("--scenes-per-batch", type=int, default=4)
    ap.add_argument("--sampler", choices=["ddpm", "ddim"], default="ddpm")
    ap.add_argument("--ddim-steps", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    run(args.workdir, T=args.T, traj_len=args.traj_len,
        n_per_cell=args.n_per_cell, scenes_per_batch=args.scenes_per_batch,
        seed=args.seed, sampler=args.sampler, ddim_steps=args.ddim_steps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
