"""MPiNets-protocol evaluation suite.

Implements the paper-grade metric definitions of the reference's Evaluator
(mpinets/metrics.py:459-729) on top of the native oracle instead of three
PyBullet simulators:

  success  := final position error < 1 cm  AND  orientation error < 15 deg
              AND physically valid (no env collision along the densified
              trajectory, no joint-limit violation, no self-collision)
  buckets  := % within 1 cm / 5 cm position error, 15 / 30 deg orientation
  plus SPARC smoothness (joint + EE) and joint/EE path lengths.

The target-region term (mpinets/metrics.py:388-407, AND-ed into success at
:533-542) is implemented in :mod:`edmp_tpu.metrics.region` over the typed
volume rows carried by PackedDataset; problems without a target_volume
(synthetic/pre-region data) pass the check trivially and are flagged via
``region_checked`` so aggregates stay honest.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np

from edmp_tpu import constants as C
from edmp_tpu.metrics.sparc import path_length_metric, smoothness_metric
from edmp_tpu.validation.oracle import TrajectoryOracle


@dataclasses.dataclass
class TrajectoryEvaluation:
    position_error: float          # meters, final EE vs target
    orientation_error: float       # degrees
    physical_success: bool         # collision-free + within joint limits
    env_collision: bool
    self_collision: bool
    joint_limit_violation: bool
    joint_smoothness: float
    ee_smoothness: float
    joint_path_length: float
    ee_path_length: float
    planning_time: float = 0.0
    # target-region term (mpinets/metrics.py:533-542); region_checked=False
    # means the problem carried no target_volume and the term is vacuous
    correct_final_region: bool = True
    region_checked: bool = False

    @property
    def success(self) -> bool:
        return (self.position_error < 0.01
                and self.orientation_error < 15.0
                and self.correct_final_region
                and self.physical_success)


def orientation_error_deg(Ra: np.ndarray, Rb: np.ndarray) -> float:
    """Geodesic angle between two rotation matrices, degrees."""
    tr = np.clip((np.trace(Ra.T @ Rb) - 1.0) / 2.0, -1.0, 1.0)
    return float(np.degrees(np.arccos(tr)))


# self-collision: inscribed-capsule model (robot/self_collision.py) — no
# structural exclusions, unlike the round-2 OBB screen (fidelity study:
# docs/self_collision.md).  Replaces robofin's FrankaSelfCollisionChecker
# used at mpinets/metrics.py:278-291.
from edmp_tpu.robot.self_collision import self_collision_free  # noqa: F401,E402


class Evaluator:
    """Per-trajectory + aggregate evaluation (mpinets/metrics.py protocol),
    including the reference's per-problem skip bookkeeping
    (mpinets/metrics.py:487-491) and group save/aggregate
    (:731-786): runs persist to JSON and any set of saved runs merges into
    one aggregate via :meth:`from_files`."""

    def __init__(self, substeps: int = 8, dt: float = 0.08,
                 check_self_collision: bool = True):
        self.oracle = TrajectoryOracle(substeps=substeps)
        self.dt = dt
        self.check_self_collision = check_self_collision
        self.results: List[TrajectoryEvaluation] = []
        # hard-failure bookkeeping: problems that could not be evaluated
        # (e.g. no IK solution, planner exception) with a reason tag
        self.skips: List[Dict[str, str]] = []

    def record_skip(self, problem_id, reason: str) -> None:
        """mpinets/metrics.py:487-491: count a problem the pipeline could
        not evaluate instead of crashing or silently dropping it."""
        self.skips.append({"problem_id": str(problem_id), "reason": reason})

    def evaluate_trajectory(self, trajectory: np.ndarray,
                            target_pose: np.ndarray,
                            obstacle_config: np.ndarray,
                            planning_time: float = 0.0,
                            target_volume: np.ndarray | None = None,
                            negative_volumes: np.ndarray | None = None,
                            ) -> TrajectoryEvaluation:
        """trajectory (N, 7), target_pose (4, 4) 'right_gripper' frame.

        ``target_volume`` (11,) / ``negative_volumes`` (m, 11) are the typed
        region rows from PackedDataset; when given, the reference's
        check_final_region term participates in success.
        """
        from edmp_tpu.metrics.region import check_final_region, has_region
        from edmp_tpu.robot.kinematics import numpy_ee_transform

        traj = np.asarray(trajectory, np.float64)
        # host numpy FK: the evaluator runs on the validator thread, where an
        # eager jnp op would be a remote dispatch per scene on tunneled
        # backends (and contend with the in-flight plan program)
        T_final = numpy_ee_transform(traj[-1])
        pos_err = float(np.linalg.norm(T_final[:3, 3] - target_pose[:3, 3]))
        ori_err = orientation_error_deg(T_final[:3, :3], target_pose[:3, :3])

        region_checked = target_volume is not None and has_region(target_volume)
        region_ok = True
        if region_checked:
            negs = (negative_volumes if negative_volumes is not None
                    else np.zeros((0, 11)))
            region_ok = check_final_region(
                T_final[:3, 3], target_volume, negs,
                np.asarray(target_pose, np.float64)[:3, 3])

        ok, _ = self.oracle.validate(traj, obstacle_config)
        env_collision = not ok
        limits_violated = bool(
            np.any(traj < C.JOINT_LIMITS_LOWER[None, :] - 1e-9)
            or np.any(traj > C.JOINT_LIMITS_UPPER[None, :] + 1e-9))
        self_coll = (not self_collision_free(traj)
                     if self.check_self_collision else False)

        js, es = smoothness_metric(traj, self.dt)
        jl, el = path_length_metric(traj)
        ev = TrajectoryEvaluation(
            position_error=pos_err,
            orientation_error=ori_err,
            physical_success=not (env_collision or limits_violated or self_coll),
            env_collision=env_collision,
            self_collision=self_coll,
            joint_limit_violation=limits_violated,
            joint_smoothness=js,
            ee_smoothness=es,
            joint_path_length=jl,
            ee_path_length=el,
            planning_time=planning_time,
            correct_final_region=region_ok,
            region_checked=region_checked,
        )
        self.results.append(ev)
        return ev

    def metrics(self) -> Dict[str, float]:
        """Aggregate table (mpinets/metrics.py:588-729 field set)."""
        if not self.results:
            return {}
        rs = self.results
        n = len(rs)
        succ = [r for r in rs if r.success]

        def pct(xs):
            return 100.0 * sum(xs) / n

        out = {
            "num_problems": n,
            "success_rate": pct([r.success for r in rs]),
            "physical_success_rate": pct([r.physical_success for r in rs]),
            "within_1cm": pct([r.position_error < 0.01 for r in rs]),
            "within_5cm": pct([r.position_error < 0.05 for r in rs]),
            "within_15deg": pct([r.orientation_error < 15 for r in rs]),
            "within_30deg": pct([r.orientation_error < 30 for r in rs]),
            "env_collision_rate": pct([r.env_collision for r in rs]),
            "self_collision_rate": pct([r.self_collision for r in rs]),
            "joint_violation_rate": pct([r.joint_limit_violation for r in rs]),
            "correct_region_rate": pct([r.correct_final_region for r in rs]),
            "region_checked_rate": pct([r.region_checked for r in rs]),
        }
        if succ:
            out.update({
                "mean_joint_smoothness": float(np.mean([r.joint_smoothness for r in succ])),
                "mean_ee_smoothness": float(np.mean([r.ee_smoothness for r in succ])),
                "mean_joint_path_length": float(np.mean([r.joint_path_length for r in succ])),
                "mean_ee_path_length": float(np.mean([r.ee_path_length for r in succ])),
                "mean_planning_time": float(np.mean([r.planning_time for r in succ])),
            })
        if self.skips:
            out["num_skipped"] = len(self.skips)
            reasons: Dict[str, int] = {}
            for s in self.skips:
                reasons[s["reason"]] = reasons.get(s["reason"], 0) + 1
            out["skip_reasons"] = reasons
        return out

    def print_metrics(self) -> None:
        for k, v in self.metrics().items():
            print(f"{k:28s} {v:.3f}" if isinstance(v, float) else f"{k:28s} {v}")

    # -- group save / aggregate (mpinets/metrics.py:731-786) ---------------

    def save(self, path: str) -> None:
        """Persist this run's per-trajectory results + skips as JSON."""
        import json

        with open(path, "w") as f:
            json.dump({
                "results": [dataclasses.asdict(r) for r in self.results],
                "skips": self.skips,
            }, f)

    @classmethod
    def from_files(cls, paths, **kwargs) -> "Evaluator":
        """Merge any number of saved runs into one aggregate evaluator —
        the reference's group-aggregation workflow (save per split, report
        the combined table)."""
        import json

        ev = cls(**kwargs)
        for path in paths:
            with open(path) as f:
                data = json.load(f)
            ev.results.extend(TrajectoryEvaluation(**r)
                              for r in data.get("results", []))
            ev.skips.extend(data.get("skips", []))
        return ev
