"""A/B study: escalating retry ladder vs reseed-only retry (r5 verdict #1).

Round 4 ended at strict 89.1% (no retry) / 90.6% (3 reseed-only retries) on
the 128-scene v2 protocol corpus, with 12 structural env-collision failures
that survive pure reseeding (docs/retry_study.md).  The reseed ladder only
redraws noise/IK seeds; this study measures the ESCALATING ladder
(parallel/sweep.RetryRound): each round can multiply the sample budget, bump
every guide's clearance schedule, enable the exact-SDF clearance hinge
(costs/clearance.py), or escalate the sampler.

Arms (one spool each, same seeds/scenes):
  base        : no retry (must reproduce the committed round-4 baseline
                scene-for-scene when run with the same weights)
  reseed3     : 3 reseed-only rounds (the round-4 production setting)
  ladder      : escalating rounds (--ladder spec)

Run (TPU): python -m tools.ladder_study --scenes 128
Writes docs/ladder_study.md + results_r5/ladder_study.json.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, os.pardir))


def spool_records(path):
    recs = []
    with open(path) as f:
        for line in f:
            try:
                recs.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return recs


def state_rows(recs):
    """last-record-wins per scene."""
    out = {}
    for r in recs:
        out[r["scene_index"]] = r
    return out


def arm_summary(tag, recs, wall=None):
    rows = state_rows(recs)
    ms = {i: r["metrics"] for i, r in rows.items() if r.get("metrics")}
    n = len(rows)
    out = {
        "tag": tag, "n": n,
        "protocol_success_pct": 100.0 * sum(
            m["protocol_success"] for m in ms.values()) / max(len(ms), 1),
        "collision_free_pct": 100.0 * sum(
            r["success"] for r in rows.values()) / n,
        "env_collision_pct": 100.0 * sum(
            m["env_collision"] for m in ms.values()) / max(len(ms), 1),
        "self_collision_pct": 100.0 * sum(
            m["self_collision"] for m in ms.values()) / max(len(ms), 1),
        "recovered": sum(r["attempt"] > 0 and r["metrics"]["protocol_success"]
                         for r in rows.values() if r.get("metrics")),
        "per_scene": {str(i): bool(m["protocol_success"])
                      for i, m in ms.items()},
    }
    if wall is not None:
        out["wall_s"] = wall
    return out


def mcnemar(a, b):
    ks = sorted(set(a["per_scene"]) & set(b["per_scene"]))
    win = sum(b["per_scene"][k] and not a["per_scene"][k] for k in ks)
    lose = sum(a["per_scene"][k] and not b["per_scene"][k] for k in ks)
    z = (win - lose) / np.sqrt(max(win + lose, 1))
    return {"arm_only": win, "base_only": lose, "z": float(z)}


def main(argv=None):
    ap = argparse.ArgumentParser(prog="ladder_study")
    ap.add_argument("--scenes", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--weights", default=os.path.join(
        REPO, "models", "synthetic_v3", "weights_inference.npz"))
    ap.add_argument("--model-tag", default="v3",
                    help="label for spool tags / report rows")
    ap.add_argument("--ladder",
                    default="mult=2,clear=0.01;"
                            "mult=4,clear=0.02,envw=0.25;"
                            "mult=4,clear=0.03,envw=0.4")
    ap.add_argument("--skip-reseed-arm", action="store_true")
    ap.add_argument("--scenes-per-batch", type=int, default=16)
    ap.add_argument("--results-dir", default=os.path.join(REPO, "results_r5"))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from edmp_tpu import planner as P
    from edmp_tpu.config import (CFG1_GUIDE_IDS, pack_ensemble,
                                 reference_guide_configs)
    from edmp_tpu.data.synthetic import synthetic_packed_dataset
    from edmp_tpu.diffusion.schedule import make_schedule
    from edmp_tpu.models import temporal_unet as tu
    from edmp_tpu.parallel.sweep import (SweepConfig, parse_retry_ladder,
                                         run_sweep)
    from edmp_tpu.utils.checkpoint import load_inference_weights

    os.makedirs(args.results_dir, exist_ok=True)
    dataset = synthetic_packed_dataset(
        np.random.default_rng(args.seed), args.scenes)
    print(f"{len(dataset)} protocol scenes (seed {args.seed})", flush=True)

    model = tu.create_model()
    params = jax.tree.map(jnp.asarray, load_inference_weights(args.weights))
    T = 255
    sch = make_schedule(T)
    plan_cfg = P.PlannerConfig(batch_size=120, sc_filter_goals=True,
                               safety_aware_selection=True)
    gp, _ = pack_ensemble(reference_guide_configs(CFG1_GUIDE_IDS), 10, T)
    plan_fn = P.make_batched_plan_fn(model, sch, plan_cfg)

    def sweep(tag, **kw):
        scfg = SweepConfig(results_dir=args.results_dir,
                           scenes_per_batch=args.scenes_per_batch,
                           full_evaluation=True, oracle_threads=True,
                           seed=args.seed, **kw)
        t0 = time.time()
        st = run_sweep(model, params, sch, gp, dataset, plan_cfg, scfg,
                       tag=tag, guide_ids=CFG1_GUIDE_IDS, plan_fn=plan_fn)
        return st, round(time.time() - t0, 1)

    mt = args.model_tag
    arms = []
    st_base, w = sweep(f"{mt}_base")
    arms.append(arm_summary("base", spool_records(st_base.path), w))
    print(json.dumps({k: v for k, v in arms[-1].items()
                      if k != "per_scene"}), flush=True)

    if not args.skip_reseed_arm:
        st_rs, w = sweep(f"{mt}_reseed3", retry_failed=3)
        arms.append(arm_summary("reseed3", spool_records(st_rs.path), w))
        print(json.dumps({k: v for k, v in arms[-1].items()
                          if k != "per_scene"}), flush=True)

    ladder = parse_retry_ladder(args.ladder)
    st_ld, w = sweep(f"{mt}_ladder", retry_ladder=ladder)
    arms.append(arm_summary("ladder", spool_records(st_ld.path), w))
    print(json.dumps({k: v for k, v in arms[-1].items()
                      if k != "per_scene"}), flush=True)

    base = arms[0]
    stats = {a["tag"]: mcnemar(base, a) for a in arms[1:]}
    # which structural (reseed-surviving) failures did the ladder crack?
    if len(arms) >= 3:
        reseed, ladder_arm = arms[1], arms[2]
        structural = [k for k, ok in reseed["per_scene"].items() if not ok]
        cracked = [k for k in structural if ladder_arm["per_scene"].get(k)]
        stats["structural"] = {
            "reseed_surviving_failures": len(structural),
            "cracked_by_ladder": len(cracked),
            "cracked_scenes": cracked,
        }

    out = {"scenes": len(dataset), "seed": args.seed,
           "weights": args.weights, "ladder": args.ladder,
           "arms": [{k: v for k, v in a.items() if k != "per_scene"}
                    for a in arms],
           "mcnemar_vs_base": {k: v for k, v in stats.items()
                               if k != "structural"},
           "structural": stats.get("structural")}
    path = os.path.join(args.results_dir, f"ladder_study_{mt}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)

    lines = [
        "# Escalating retry ladder vs reseed-only retry",
        "",
        f"{len(dataset)} synthetic protocol scenes (seed {args.seed}), cfg1 "
        f"12-guide ensemble (batch 120), DDPM-255, safety mode, model "
        f"`{os.path.relpath(args.weights, REPO)}`.  The ladder escalates "
        f"each retry round (`{args.ladder}`): sample-budget multiplier, "
        "additive clearance bump on every guide schedule, and the exact-SDF "
        "clearance hinge (costs/clearance.py) — attacking the env-collision "
        "failures that survive pure reseeding (docs/retry_study.md).",
        "",
        "| arm | strict % | env-coll % | recovered | wall s |",
        "|---|---|---|---|---|",
    ]
    for a in arms:
        lines.append(
            f"| {a['tag']} | {a['protocol_success_pct']:.1f} | "
            f"{a['env_collision_pct']:.1f} | {a.get('recovered', '-')} | "
            f"{a.get('wall_s', '-')} |")
    if stats.get("structural"):
        s = stats["structural"]
        lines += ["",
                  f"Structural failures (surviving 3 reseed-only rounds): "
                  f"{s['reseed_surviving_failures']}; cracked by the "
                  f"escalating ladder: {s['cracked_by_ladder']} "
                  f"(scenes {', '.join(s['cracked_scenes']) or '-'})."]
    lines += ["", "Paired McNemar vs no-retry:",
              "", "| arm | arm-only wins | base-only wins | z |",
              "|---|---|---|---|"]
    for tag, s in stats.items():
        if tag == "structural":
            continue
        lines.append(f"| {tag} | {s['arm_only']} | {s['base_only']} | "
                     f"{s['z']:.2f} |")
    with open(os.path.join(REPO, "docs", "ladder_study.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote docs/ladder_study.md + {path}", flush=True)


if __name__ == "__main__":
    main()
