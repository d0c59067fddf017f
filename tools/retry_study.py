"""A/B study: adaptive reseed-retry over failed scenes (SweepConfig.retry_failed).

Round-4 frontier: with safety-aware selection the strict MPiNets-protocol
success on the 128-scene v2 corpus is 89.1% and EVERY residual failure is an
env collision — i.e. scenes where none of the 120 samples in the batch came
out collision-free for the sampled noise/goal draw.  The reference plans each
scene exactly once (infer_serial.py); production failure recovery replans
failures with fresh randomness.  This study measures that loop:

  One sweep runs with retry_failed = max; the state after every intermediate
  round k is derived from the spool (records carry `attempt`, replacement is
  only-if-better, so "after round k" = last record with attempt <= k).  The
  derived round-0 row must reproduce the committed sweep_v2_safe_only
  baseline scene-for-scene (same seeds, same program) — checked.  Paired
  McNemar vs round 0 is monotone by construction (base_only wins must be 0).

Run (TPU): python -m tools.retry_study --scenes 128
Writes docs/retry_study.md + results_r4/retry_study.json.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, os.pardir))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="retry_study")
    ap.add_argument("--scenes", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--weights", default=os.path.join(
        REPO, "models", "synthetic_v3", "weights_inference.npz"))
    ap.add_argument("--max-retries", type=int, default=3)
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
    # the winning round-4 safety mode (docs/assist_study.md): sc-filtered
    # goals + safety-aware best-of-batch selection, steering weights off
    plan_cfg = P.PlannerConfig(batch_size=120, sc_filter_goals=True,
                               safety_aware_selection=True)
    gp, _ = pack_ensemble(reference_guide_configs(CFG1_GUIDE_IDS), 10, T)
    plan_fn = P.make_batched_plan_fn(model, sch, plan_cfg)

    R = args.max_retries
    scfg = SweepConfig(results_dir=args.results_dir,
                       scenes_per_batch=args.scenes_per_batch,
                       full_evaluation=True, oracle_threads=True,
                       seed=args.seed, retry_failed=R)
    t0 = time.time()
    st = run_sweep(model, params, sch, gp, dataset, plan_cfg, scfg,
                   tag=f"v2_safe_retry{R}", guide_ids=CFG1_GUIDE_IDS,
                   plan_fn=plan_fn)
    wall = round(time.time() - t0, 1)

    # reconstruct the cumulative state after each round k from the spool:
    # replacement is only-if-better, so "after round k" = the last record
    # per scene with attempt <= k
    spooled = []
    with open(st.path) as f:
        for line in f:
            try:
                spooled.append(json.loads(line))
            except json.JSONDecodeError:
                continue

    def after_round(k):
        recs = {}
        for rec in spooled:
            if rec["attempt"] <= k:
                recs[rec["scene_index"]] = rec
        ms = [r["metrics"] for r in recs.values()]
        n = len(ms)
        return {
            "tag": f"retry{k}", "n": n, "retry_failed": k,
            "protocol_success_pct": 100.0 * sum(
                m["protocol_success"] for m in ms) / n,
            "collision_free_pct": 100.0 * sum(
                r["success"] for r in recs.values()) / n,
            "env_collision_pct": 100.0 * sum(
                m["env_collision"] for m in ms) / n,
            "self_collision_pct": 100.0 * sum(
                m["self_collision"] for m in ms) / n,
            "recovered": sum(r["attempt"] > 0 and r["metrics"][
                "protocol_success"] for r in recs.values()),
            "per_scene": {str(i): bool(r["metrics"]["protocol_success"])
                          for i, r in recs.items()},
        }

    rows = [after_round(k) for k in range(R + 1)]
    rows[-1]["wall_s"] = wall
    for r in rows:
        print(json.dumps({k: v for k, v in r.items() if k != "per_scene"}),
              flush=True)
    base = rows[0]

    # consistency: round 0 must reproduce the committed safe_only baseline
    base_spool = os.path.join(args.results_dir, "sweep_v2_safe_only.jsonl")
    base_check = None
    if os.path.exists(base_spool):
        committed = {}
        with open(base_spool) as f:
            for line in f:
                rec = json.loads(line)
                committed[str(rec["scene_index"])] = bool(
                    rec["metrics"]["protocol_success"])
        shared = set(committed) & set(base["per_scene"])
        mismatches = [k for k in shared
                      if committed[k] != base["per_scene"][k]]
        base_check = {"shared": len(shared), "mismatches": len(mismatches)}
        print(f"round-0 vs committed safe_only: {base_check}", flush=True)

    def mcnemar(a, b):
        ks = sorted(set(a["per_scene"]) & set(b["per_scene"]))
        win = sum(b["per_scene"][k] and not a["per_scene"][k] for k in ks)
        lose = sum(a["per_scene"][k] and not b["per_scene"][k] for k in ks)
        z = (win - lose) / np.sqrt(max(win + lose, 1))
        return {"arm_only": win, "base_only": lose, "z": float(z)}

    stats = {r["tag"]: mcnemar(base, r) for r in rows[1:]}
    out = {"scenes": len(dataset), "seed": args.seed,
           "arms": [{k: v for k, v in r.items() if k != "per_scene"}
                    for r in rows],
           "mcnemar_vs_noretry": stats,
           "round0_vs_committed_baseline": base_check}
    with open(os.path.join(args.results_dir, "retry_study.json"), "w") as f:
        json.dump(out, f, indent=1)

    lines = [
        "# Adaptive reseed-retry: replanning failed scenes",
        "",
        f"{len(dataset)} synthetic protocol scenes (seed {args.seed}), cfg1 "
        "12-guide ensemble (batch 120), DDPM-255, safety mode "
        "(`--sc-filter-goals --safe-selection`), trained model "
        "`models/synthetic_v3`.  `--retry-failed N` replans strict-protocol "
        "failures up to N extra rounds with fresh sampling noise and IK q7 "
        "seeds; a retry replaces the spooled record only when strictly "
        "better, so success is monotone in N "
        "(tests/test_parallel.py::test_sweep_retry_failed_monotone).",
        "",
        "| arm | strict % | env-coll % | recovered | wall s |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['tag']} | {r['protocol_success_pct']:.1f} | "
            f"{r['env_collision_pct']:.1f} | {r.get('recovered', '-')} | "
            f"{r.get('wall_s', '-')} |")
    lines += ["", "Paired McNemar vs no-retry (base_only must be 0 — "
              "replacement is only-if-better):", "",
              "| arm | arm-only wins | base-only wins | z |", "|---|---|---|---|"]
    for tag, st_ in stats.items():
        lines.append(f"| {tag} | {st_['arm_only']} | {st_['base_only']} | "
                     f"{st_['z']:.2f} |")
    with open(os.path.join(REPO, "docs", "retry_study.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote docs/retry_study.md", flush=True)


if __name__ == "__main__":
    main()
