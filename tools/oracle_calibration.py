"""Oracle calibration study (SURVEY.md §7 risk 3).

The reference's success oracle is a PyBullet PD-servo execution with contact
polling (lib/environment.py:632-680); ours is a deterministic geometric check
(densified segment collision, validation/csrc/oracle.cc).  This study
quantifies how sensitive the success verdict is to the two knobs that
separate the definitions:

  1. segment densification (``substeps``): sweep {1,2,4,8,16,32} against a
     substeps=64 ground truth on (a) a random smooth-trajectory corpus and
     (b) a *boundary* corpus constructed by bisecting joint-space blends
     between collision-free and colliding trajectories to land just on the
     free side — the worst case for sparse sampling;
  2. PD tracking lag: the servo never tracks waypoints exactly, so emulate
     execution error as q_exec[i] = q[i] - lag*(q[i] - q[i-1]) (the arm
     trailing its command) and measure verdict flips at lag in {5%, 10%, 20%}.

Writes docs/oracle_calibration.{json,md}.  Host-only (C++ oracle, no jax).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from edmp_tpu.data import synthetic  # noqa: E402
from edmp_tpu.validation.oracle import TrajectoryOracle  # noqa: E402

SUBSTEPS = [1, 2, 4, 8, 16, 32]
TRUTH = 64
N_SCENES = 60
TRAJS_PER_SCENE = 6
N_WAYPOINTS = 50


def build_corpora(rng):
    """Returns (scenes, random_corpus, boundary_corpus) where each corpus is
    a list of (scene_idx, trajectory)."""
    oracle = TrajectoryOracle(substeps=TRUTH)
    scenes = [synthetic.random_obstacle_config(rng, 6)
              for _ in range(N_SCENES)]
    random_corpus = []
    free, hit = [], []
    for si, oc in enumerate(scenes):
        trajs = synthetic.smooth_trajectories(rng, TRAJS_PER_SCENE,
                                              N_WAYPOINTS)
        for tr in trajs:
            random_corpus.append((si, tr))
            (free if oracle.validate(tr, oc)[0] else hit).append((si, tr))

    # boundary corpus: bisect blends between a free and a colliding
    # trajectory of the SAME scene to just inside the free region
    by_scene_free = {}
    by_scene_hit = {}
    for si, tr in free:
        by_scene_free.setdefault(si, []).append(tr)
    for si, tr in hit:
        by_scene_hit.setdefault(si, []).append(tr)
    boundary = []
    for si in sorted(set(by_scene_free) & set(by_scene_hit)):
        oc = scenes[si]
        for tf in by_scene_free[si][:2]:
            th = by_scene_hit[si][0]
            lo_a, hi_a = 0.0, 1.0   # blend 0 = free, 1 = colliding
            for _ in range(20):
                mid = 0.5 * (lo_a + hi_a)
                tr = (1 - mid) * tf + mid * th
                if oracle.validate(tr, oc)[0]:
                    lo_a = mid
                else:
                    hi_a = mid
            tr = (1 - lo_a) * tf + lo_a * th   # just on the free side
            if oracle.validate(tr, oc)[0]:
                boundary.append((si, tr))

    # sparse corpus: every 5th waypoint (10-waypoint trajectories) — the
    # per-segment joint motion is 5x larger, so inter-waypoint collisions
    # (what substeps exists for) actually occur
    sparse_corpus = [(si, tr[::5]) for si, tr in random_corpus]
    return scenes, random_corpus, boundary, sparse_corpus


def verdicts(corpus, scenes, substeps):
    oracle = TrajectoryOracle(substeps=substeps)
    return np.asarray([oracle.validate(tr, scenes[si])[0]
                       for si, tr in corpus])


def main():
    rng = np.random.default_rng(0)
    scenes, rand_c, bound_c, sparse_c = build_corpora(rng)
    out = {
        "corpora": {"random": len(rand_c), "boundary": len(bound_c),
                    "sparse": len(sparse_c)},
        "truth_substeps": TRUTH,
        "substeps_sweep": {},
        "tracking_lag": {},
    }

    truth_r = verdicts(rand_c, scenes, TRUTH)
    truth_b = verdicts(bound_c, scenes, TRUTH)
    truth_s = verdicts(sparse_c, scenes, TRUTH)
    for s in SUBSTEPS + [TRUTH]:
        vr = verdicts(rand_c, scenes, s)
        vb = verdicts(bound_c, scenes, s)
        vs = verdicts(sparse_c, scenes, s)
        out["substeps_sweep"][str(s)] = {
            "random_success_rate": round(100.0 * vr.mean(), 2),
            "random_flips_vs_truth": int((vr != truth_r).sum()),
            "boundary_success_rate": round(100.0 * vb.mean(), 2),
            "boundary_flips_vs_truth": int((vb != truth_b).sum()),
            "sparse_success_rate": round(100.0 * vs.mean(), 2),
            "sparse_flips_vs_truth": int((vs != truth_s).sum()),
        }

    # PD tracking-lag emulation at the production substeps (8)
    oracle = TrajectoryOracle(substeps=8)
    base_r = verdicts(rand_c, scenes, 8)
    base_b = verdicts(bound_c, scenes, 8)
    for lag in (0.05, 0.10, 0.20):
        def lagged(tr):
            out_tr = tr.copy()
            out_tr[1:] = tr[1:] - lag * (tr[1:] - tr[:-1])
            return out_tr

        vr = np.asarray([oracle.validate(lagged(tr), scenes[si])[0]
                         for si, tr in rand_c])
        vb = np.asarray([oracle.validate(lagged(tr), scenes[si])[0]
                         for si, tr in bound_c])
        out["tracking_lag"][f"{lag:.2f}"] = {
            "random_flips": int((vr != base_r).sum()),
            "random_success_rate": round(100.0 * vr.mean(), 2),
            "boundary_flips": int((vb != base_b).sum()),
            "boundary_success_rate": round(100.0 * vb.mean(), 2),
        }

    docs = os.path.join(os.path.dirname(__file__), os.pardir, "docs")
    os.makedirs(docs, exist_ok=True)
    with open(os.path.join(docs, "oracle_calibration.json"), "w") as f:
        json.dump(out, f, indent=1)

    lines = [
        "# Oracle calibration",
        "",
        "Sensitivity of the geometric success oracle to segment "
        f"densification and tracking error. Corpora: {len(rand_c)} random "
        f"smooth trajectories, {len(bound_c)} boundary (bisected-to-grazing) "
        f"trajectories; ground truth substeps={TRUTH}.",
        "",
        "| substeps | random succ % | flips | boundary succ % | flips |"
        " sparse succ % | flips |",
        "|---|---|---|---|---|---|---|",
    ]
    for s in SUBSTEPS + [TRUTH]:
        d = out["substeps_sweep"][str(s)]
        lines.append(
            f"| {s} | {d['random_success_rate']} | "
            f"{d['random_flips_vs_truth']} | {d['boundary_success_rate']} | "
            f"{d['boundary_flips_vs_truth']} | {d['sparse_success_rate']} | "
            f"{d['sparse_flips_vs_truth']} |")
    lines += [
        "",
        "| tracking lag | random succ % | flips | boundary succ % | flips |",
        "|---|---|---|---|---|",
    ]
    for lag, d in out["tracking_lag"].items():
        lines.append(
            f"| {lag} | {d['random_success_rate']} | {d['random_flips']} | "
            f"{d['boundary_success_rate']} | {d['boundary_flips']} |")
    lines += [
        "",
        "Reading: random-corpus verdicts are insensitive to substeps beyond "
        "the production setting if the flip counts are ~0 there; boundary "
        "trajectories bound the worst case (they sit within float-epsilon "
        "of contact by construction). The tracking-lag rows quantify how a "
        "PyBullet-style imperfect servo would shift success rates.",
    ]
    with open(os.path.join(docs, "oracle_calibration.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
