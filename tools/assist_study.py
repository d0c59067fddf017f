"""A/B study: self-collision + joint-limit assist guidance (costs/assist.py).

Round-3 finding (VERDICT): on the 128-scene protocol corpus the strict
MPiNets-protocol success was 44.5% vs 82.8% collision-free — 65/128 scenes
failed on self-collision and 12 on joint limits, axes the reference's
obstacle-only guide ensemble (lib/guide.py:354-537) cannot steer.  This
study measures the assist terms' effect on the same corpus distribution:

  arms: baseline (no assist)  |  jl only  |  jl + sc at several weights
  metrics per arm: strict protocol success, collision-free success,
    self-collision / joint-limit / env-collision rates, mean plan time
  paired stats: McNemar (ensemble harness convention, docs/ensemble_study.md)

Run (TPU): python -m tools.assist_study --scenes 128
Writes docs/assist_study.md + results_r4/assist_study.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, os.pardir))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="assist_study")
    ap.add_argument("--scenes", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--weights", default=os.path.join(
        REPO, "models", "synthetic_v3", "weights_inference.npz"))
    ap.add_argument("--tag-prefix", default="v2_",
                    help="spool tag prefix (bump when the corpus generator "
                    "changes — resume is per-tag)")
    ap.add_argument("--sc-weights", default="5,20",
                    help="comma list of self-collision weights to sweep "
                    "(each arm also carries jl=1)")
    ap.add_argument("--jl-weight", type=float, default=1.0)
    ap.add_argument("--scenes-per-batch", type=int, default=16)
    ap.add_argument("--results-dir", default=os.path.join(REPO, "results_r4"))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from edmp_tpu import planner as P
    from edmp_tpu.config import (CFG1_GUIDE_IDS, pack_ensemble,
                                 reference_guide_configs)
    from edmp_tpu.data.synthetic import synthetic_packed_dataset
    from edmp_tpu.diffusion.schedule import make_schedule
    from edmp_tpu.models import temporal_unet as tu
    from edmp_tpu.parallel.sweep import SweepConfig, run_sweep
    from edmp_tpu.utils.checkpoint import load_inference_weights

    os.makedirs(args.results_dir, exist_ok=True)
    dataset = synthetic_packed_dataset(
        np.random.default_rng(args.seed), args.scenes)
    print(f"{len(dataset)} synthetic scenes (seed {args.seed})", flush=True)

    model = tu.create_model()
    params = jax.tree.map(jnp.asarray, load_inference_weights(args.weights))
    T = 255
    sch = make_schedule(T)
    plan_cfg = P.PlannerConfig(batch_size=120)
    gp, _ = pack_ensemble(reference_guide_configs(CFG1_GUIDE_IDS), 10, T)
    B = 120
    scfg = SweepConfig(results_dir=args.results_dir,
                       scenes_per_batch=args.scenes_per_batch,
                       full_evaluation=True, oracle_threads=True,
                       seed=args.seed)

    # distinct compiled programs: (assist on/off) x (safety on/off); arms
    # sharing a structure share the compile because the weight VALUES are
    # jitted-program arguments
    safe_cfg = dataclasses.replace(plan_cfg, sc_filter_goals=True,
                                   safety_aware_selection=True)
    plan_fns = {}

    def arm(tag, sc_w, jl_w, safe=False):
        cfg_a = safe_cfg if safe else plan_cfg
        key = (sc_w is None and jl_w is None, safe)
        if key not in plan_fns:
            plan_fns[key] = P.make_batched_plan_fn(model, sch, cfg_a)
        fn = plan_fns[key]
        g = gp
        if not (sc_w is None and jl_w is None):
            g = gp._replace(
                self_collision_weight=(None if sc_w is None else
                                       jnp.full(B, sc_w, jnp.float32)),
                joint_limit_weight=(None if jl_w is None else
                                    jnp.full(B, jl_w, jnp.float32)))
        t0 = time.time()
        st = run_sweep(model, params, sch, g, dataset, cfg_a, scfg,
                       tag=args.tag_prefix + tag, guide_ids=CFG1_GUIDE_IDS,
                       plan_fn=fn)
        s = st.summary()
        recs = sorted(st.completed.values(), key=lambda r: r["scene_index"])
        ms = [r["metrics"] for r in recs]
        n = len(ms)
        row = {
            "tag": tag, "n": n,
            "sc_weight": sc_w, "jl_weight": jl_w, "safe": safe,
            "protocol_success_pct": 100.0 * sum(
                m["protocol_success"] for m in ms) / n,
            "collision_free_pct": s["overall"]["success_rate"],
            "self_collision_pct": 100.0 * sum(
                m["self_collision"] for m in ms) / n,
            "joint_violation_pct": 100.0 * sum(
                m["joint_limit_violation"] for m in ms) / n,
            "env_collision_pct": 100.0 * sum(
                m["env_collision"] for m in ms) / n,
            "within_1cm_pct": 100.0 * sum(
                m["position_error"] < 0.01 for m in ms) / n,
            "mean_plan_s": s.get("timing", {}).get("mean_plan_s"),
            "wall_s": round(time.time() - t0, 1),
            "per_scene": {str(r["scene_index"]):
                          bool(r["metrics"]["protocol_success"])
                          for r in recs},
        }
        print(json.dumps({k: v for k, v in row.items()
                          if k != "per_scene"}), flush=True)
        return row

    rows = [arm("assist_base", None, None),
            arm("assist_jl", None, args.jl_weight)]
    for w in [float(x) for x in args.sc_weights.split(",") if x]:
        rows.append(arm(f"assist_sc{w:g}_jl", w, args.jl_weight))
    # safety arms: sc-filtered goals + safety-aware selection, with and
    # without the steering hinges
    rows.append(arm("safe_only", None, None, safe=True))
    rows.append(arm("safe_jl", None, args.jl_weight, safe=True))
    for w in [float(x) for x in args.sc_weights.split(",") if x]:
        rows.append(arm(f"safe_sc{w:g}_jl", w, args.jl_weight, safe=True))

    base = rows[0]

    def mcnemar(a, b):
        ks = sorted(set(a["per_scene"]) & set(b["per_scene"]))
        win = sum(b["per_scene"][k] and not a["per_scene"][k] for k in ks)
        lose = sum(a["per_scene"][k] and not b["per_scene"][k] for k in ks)
        z = (win - lose) / np.sqrt(max(win + lose, 1))
        return {"arm_only": win, "base_only": lose, "z": float(z)}

    stats = {r["tag"]: mcnemar(base, r) for r in rows[1:]}
    best = max(rows[1:], key=lambda r: r["protocol_success_pct"])
    out = {"scenes": len(dataset), "seed": args.seed,
           "arms": [{k: v for k, v in r.items() if k != "per_scene"}
                    for r in rows],
           "mcnemar_vs_base": stats, "best_arm": best["tag"]}
    with open(os.path.join(args.results_dir, "assist_study.json"), "w") as f:
        json.dump(out, f, indent=1)

    base_t = base["mean_plan_s"] or float("nan")
    lines = [
        "# Assist-guidance A/B: self-collision + joint-limit terms",
        "",
        f"{len(dataset)} synthetic protocol scenes (seed {args.seed}), cfg1 "
        "12-guide ensemble (batch 120), DDPM-255, trained model "
        "`models/synthetic_v3`; strict success = full MPiNets protocol "
        "(<1cm, <15deg, region, no env/self collision, no joint-limit "
        "violation).  Assist terms: costs/assist.py (capsule-penetration "
        "hinge + joint-limit partial projection), applied at every guided "
        "step.  Baseline arm = reference-parity program (weights None).",
        "",
        "| arm | strict success % | collision-free % | self-coll % | "
        "joint-viol % | env-coll % | <1cm % | plan s/scene |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        if r["mean_plan_s"]:  # resumed spools carry no fresh timing
            dtp = f"{r['mean_plan_s']:.3f}"
            if base_t == base_t and base_t:
                dtp += f" ({100 * (r['mean_plan_s'] / base_t - 1):+.1f}%)"
        else:
            dtp = "-"
        lines.append(
            f"| {r['tag']} | {r['protocol_success_pct']:.1f} | "
            f"{r['collision_free_pct']:.1f} | {r['self_collision_pct']:.1f} | "
            f"{r['joint_violation_pct']:.1f} | {r['env_collision_pct']:.1f} | "
            f"{r['within_1cm_pct']:.1f} | {dtp} |")
    lines += ["", "Paired McNemar (strict success) vs baseline:", "",
              "| arm | arm-only wins | base-only wins | z |", "|---|---|---|---|"]
    for tag, mc in stats.items():
        lines.append(f"| {tag} | {mc['arm_only']} | {mc['base_only']} | "
                     f"{mc['z']:.2f} |")
    lines.append("")
    with open(os.path.join(REPO, "docs", "assist_study.md"), "w") as f:
        f.write("\n".join(lines))
    print("best arm:", best["tag"],
          f"{best['protocol_success_pct']:.1f}% strict "
          f"(base {base['protocol_success_pct']:.1f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
