"""Ensemble-vs-single-guide study on HARD narrow-passage scenes.

EDMP's core claim is that an ENSEMBLE of cost-guide hyperparameterizations
beats any single guide (reference README.md:24-30).  On easy scenes the
effect saturates (round 2: ensemble tied best-single at ~86% on the easy
synthetic distribution).  This study runs the cfg1 12-guide ensemble against
EVERY single guide at MATCHED COMPUTE (batch 120 either way: 12x10 vs
1x120) on cubby/dresser-like narrow-passage scenes
(data/synthetic.hard_scene_dataset) where single-guide success drops well
below ceiling, and reports success rates with standard errors.

One compile total: guide hyperparameters are arguments of the jitted plan
program, so all 13 sweeps reuse one plan_fn (run_sweep(plan_fn=...)).

Run (TPU): python -m tools.ensemble_study --scenes 48
Writes docs/ensemble_study.md + results_r3/ensemble_study.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, os.pardir))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="ensemble_study")
    ap.add_argument("--scenes", type=int, default=48)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--window-half", type=float, default=0.13)
    ap.add_argument("--family", choices=["cubby", "clutter"],
                    default="clutter",
                    help="hard-scene family: 'cubby' = wall+window "
                    "(floors the synthetic prior — honest negative), "
                    "'clutter' = line-blocking obstacle fields whose "
                    "difficulty the prior can engage with")
    ap.add_argument("--n-obstacles", type=int, default=10,
                    help="clutter family: obstacles per scene")
    ap.add_argument("--weights", default=os.path.join(
        REPO, "models", "synthetic_v3", "weights_inference.npz"))
    ap.add_argument("--sampler", choices=["ddpm", "ddim"], default="ddpm")
    ap.add_argument("--ddim-steps", type=int, default=64)
    ap.add_argument("--results-dir", default=os.path.join(REPO, "results_r3"))
    ap.add_argument("--dataset-npz", default=None,
                    help="reuse a previously generated hard-scene set")
    ap.add_argument("--calibrate", default=None,
                    help="comma list of window_half values: run the ensemble "
                    "only at each difficulty (on --scenes scenes) to find "
                    "the level where success is mid-range, then exit")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from edmp_tpu import planner as P
    from edmp_tpu.config import (CFG1_GUIDE_IDS, pack_ensemble,
                                 reference_guide_configs)
    from edmp_tpu.data.problems import PackedDataset
    from edmp_tpu.data.synthetic import (cluttered_scene_dataset,
                                         hard_scene_dataset)
    from edmp_tpu.diffusion.schedule import make_schedule
    from edmp_tpu.models import temporal_unet as tu
    from edmp_tpu.parallel.sweep import SweepConfig, run_sweep
    from edmp_tpu.utils.checkpoint import load_inference_weights

    os.makedirs(args.results_dir, exist_ok=True)

    if args.calibrate:
        model = tu.create_model()
        params = jax.tree.map(jnp.asarray,
                              load_inference_weights(args.weights))
        T = 255
        sch = make_schedule(T)
        plan_cfg = P.PlannerConfig(batch_size=120, sampler=args.sampler,
                                   ddim_steps=args.ddim_steps)
        plan_fn = P.make_batched_plan_fn(model, sch, plan_cfg)
        gp, _ = pack_ensemble(reference_guide_configs(CFG1_GUIDE_IDS), 10, T)
        scfg = SweepConfig(results_dir=args.results_dir,
                           oracle_threads=False)
        for wh in [float(x) for x in args.calibrate.split(",")]:
            if args.family == "clutter":
                ds = cluttered_scene_dataset(
                    np.random.default_rng(args.seed), args.scenes,
                    n_obstacles=int(wh))
            else:
                ds = hard_scene_dataset(np.random.default_rng(args.seed),
                                        args.scenes, window_half=wh)
            st = run_sweep(model, params, sch, gp, ds, plan_cfg, scfg,
                           tag=f"cal_{args.family}{wh:g}",
                           guide_ids=CFG1_GUIDE_IDS,
                           plan_fn=plan_fn)
            s = st.summary()["overall"]
            print(json.dumps({"window_half": wh, "n": s["n"],
                              "success_pct": s["success_rate"]}), flush=True)
        return 0

    ds_path = args.dataset_npz or os.path.join(
        args.results_dir,
        f"hard_{args.family}_s{args.seed}_n{args.scenes}.npz")
    if os.path.exists(ds_path):
        dataset = PackedDataset.load(ds_path)
        print(f"loaded {len(dataset)} hard scenes from {ds_path}", flush=True)
    else:
        t0 = time.time()
        if args.family == "clutter":
            dataset = cluttered_scene_dataset(
                np.random.default_rng(args.seed), args.scenes,
                n_obstacles=args.n_obstacles)
        else:
            dataset = hard_scene_dataset(np.random.default_rng(args.seed),
                                         args.scenes,
                                         window_half=args.window_half)
        dataset.save(ds_path)
        print(f"generated {len(dataset)} hard scenes in "
              f"{time.time() - t0:.0f}s -> {ds_path}", flush=True)

    model = tu.create_model()
    params = jax.tree.map(jnp.asarray, load_inference_weights(args.weights))
    T = 255
    sch = make_schedule(T)
    plan_cfg = P.PlannerConfig(batch_size=120, sampler=args.sampler,
                               ddim_steps=args.ddim_steps)
    plan_fn = P.make_batched_plan_fn(model, sch, plan_cfg)
    scfg = SweepConfig(results_dir=args.results_dir, oracle_threads=False)

    gcfgs = reference_guide_configs(CFG1_GUIDE_IDS)

    def sweep(tag, guides, ids):
        spg = 120 // len(guides)
        gp, _ = pack_ensemble(guides, spg, T)
        t0 = time.time()
        st = run_sweep(model, params, sch, gp, dataset, plan_cfg, scfg,
                       tag=tag, guide_ids=ids, plan_fn=plan_fn)
        s = st.summary()
        n = s["overall"]["n"]
        p = s["overall"]["success_rate"] / 100.0
        se = float(np.sqrt(max(p * (1 - p), 1e-9) / n))
        row = {"tag": tag, "n": n, "success_pct": 100 * p,
               "se_pct": 100 * se, "wall_s": round(time.time() - t0, 1),
               "by_type": {k: v for k, v in s.items()
                           if k in ("cubby", "merged_cubby", "dresser")},
               "per_scene": {str(i): bool(r["success"])
                             for i, r in st.completed.items()}}
        if "per_guide" in s:
            row["per_guide"] = s["per_guide"]
        print(json.dumps(row), flush=True)
        return row

    rows = [sweep(f"{args.family}_ensemble", gcfgs, CFG1_GUIDE_IDS)]
    for gid, gc in zip(CFG1_GUIDE_IDS, gcfgs):
        rows.append(sweep(f"{args.family}_single_g{gid}", [gc], [gid]))

    ens = rows[0]
    singles = rows[1:]
    best = max(singles, key=lambda r: r["success_pct"])
    lift = ens["success_pct"] - best["success_pct"]
    sig = np.hypot(ens["se_pct"], best["se_pct"])

    # PAIRED comparison (same scenes in both arms -> McNemar): far more
    # power than independent s.e. at these n
    def paired(a, b):
        ks = sorted(set(a["per_scene"]) & set(b["per_scene"]))
        win = sum(a["per_scene"][k] and not b["per_scene"][k] for k in ks)
        lose = sum(b["per_scene"][k] and not a["per_scene"][k] for k in ks)
        z = (win - lose) / np.sqrt(max(win + lose, 1))
        return {"ens_only": win, "single_only": lose, "z": float(z)}

    mcnemar = {r["tag"]: paired(ens, r) for r in singles}
    mc_best = mcnemar[best["tag"]]
    verdict = ("ensemble > best single (paired z = %.2f > 2)" % mc_best["z"]
               if mc_best["z"] > 2 else
               "no significant ensemble lift vs best single (paired z = "
               "%.2f)" % mc_best["z"]
               if mc_best["z"] >= -2 else
               "best single > ensemble (paired z = %.2f)" % mc_best["z"])

    out = {"scenes": len(dataset), "sampler": args.sampler,
           "window_half": args.window_half,
           "ensemble": ens, "singles": singles,
           "best_single": best["tag"], "lift_pct": lift,
           "lift_se_pct": float(sig), "mcnemar": mcnemar,
           "verdict": verdict}
    with open(os.path.join(args.results_dir, "ensemble_study.json"),
              "w") as f:
        json.dump(out, f, indent=1)

    lines = [
        "# Ensemble lift on hard narrow-passage scenes",
        "",
        f"{len(dataset)} cubby/dresser-like scenes "
        f"(data/synthetic.hard_scene_dataset, window_half="
        f"{args.window_half}, seed {args.seed}); "
        f"sampler {args.sampler}; matched compute: batch 120 for every row "
        f"(ensemble = 12 guides x 10 samples, single = 1 guide x 120 "
        "samples); success = C++ oracle collision-free execution.",
        "",
        "| config | success % | s.e. % |",
        "|---|---|---|",
        f"| **cfg1 ensemble (12 guides)** | {ens['success_pct']:.1f} | "
        f"{ens['se_pct']:.1f} |",
    ]
    for r in sorted(singles, key=lambda r: -r["success_pct"]):
        lines.append(f"| {r['tag']} | {r['success_pct']:.1f} | "
                     f"{r['se_pct']:.1f} |")
    lines += [
        "",
        f"**Verdict**: {verdict} — unpaired lift {lift:+.1f}% vs "
        f"{best['tag']}; paired on shared scenes: ensemble-only successes "
        f"{mc_best['ens_only']}, single-only {mc_best['single_only']}.",
        "",
        "Paired (McNemar) vs every single guide:",
        "",
        "| single guide | ensemble-only wins | single-only wins | z |",
        "|---|---|---|---|",
    ]
    for tag_, mc in sorted(mcnemar.items()):
        lines.append(f"| {tag_} | {mc['ens_only']} | {mc['single_only']} | "
                     f"{mc['z']:.2f} |")
    lines.append("")
    if "per_guide" in ens:
        lines += ["## Ensemble attribution (which guide won the selection)",
                  "", "| guide | wins | successes when winning |", "|---|---|---|"]
        for g, d in ens["per_guide"].items():
            lines.append(f"| {g} | {d['wins']} | "
                         f"{d['successes_when_winning']} |")
        lines.append("")
    with open(os.path.join(REPO, "docs", "ensemble_study.md"), "w") as f:
        f.write("\n".join(lines))
    print(verdict)
    return 0


if __name__ == "__main__":
    sys.exit(main())
