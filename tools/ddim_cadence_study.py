"""DDIM guidance-cadence study (VERDICT r2 #9).

``denoise_guided_ddim`` goes beyond the reference (which always runs all
T=255 reverse steps) and is advertised as the 4x-faster mode — but its
guidance cadence was chosen, not tuned.  This study sweeps
(ddim_steps x guidance_period) against the DDPM-255 quality reference on a
fixed synthetic benchmark and commits the quality/speed frontier, giving the
advertised fast mode a tuning provenance.

Round-4 upgrade (VERDICT r3 #3): n >= 256 scenes with PAIRED McNemar
statistics against the DDPM-255 reference row — at the old n=64 the
headline "quality-matched" claim sat inside +/-1.6-point noise.

Run (TPU): python -m tools.ddim_cadence_study --scenes 256
Writes docs/ddim_cadence.md + results_r4/ddim_cadence.json.
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
    ap = argparse.ArgumentParser(prog="ddim_cadence_study")
    ap.add_argument("--scenes", type=int, default=256)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--weights", default=os.path.join(
        REPO, "models", "synthetic_v3", "weights_inference.npz"))
    ap.add_argument("--results-dir", default=os.path.join(REPO, "results_r4"))
    ap.add_argument("--configs", default="ddpm:255:2,ddim:64:2,"
                    "ddim:32:1,ddim:32:2,ddim:16:1,ddim:16:2",
                    help="comma list of sampler:steps:period")
    ap.add_argument("--tag-prefix", default="v2_",
                    help="spool tag prefix (corpus-generator version)")
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
    model = tu.create_model()
    params = jax.tree.map(jnp.asarray, load_inference_weights(args.weights))
    T = 255
    sch = make_schedule(T)
    gp, _ = pack_ensemble(reference_guide_configs(CFG1_GUIDE_IDS), 10, T)

    rows = []
    for spec in args.configs.split(","):
        sampler, steps, period = spec.split(":")
        steps, period = int(steps), int(period)
        plan_cfg = P.PlannerConfig(
            batch_size=120, sampler=sampler, ddim_steps=steps,
            ddim_guidance_period=period)
        scfg = SweepConfig(results_dir=args.results_dir,
                           oracle_threads=False)
        tag = f"{args.tag_prefix}cad_{sampler}{steps}_p{period}"
        t0 = time.time()
        st = run_sweep(model, params, sch, gp, dataset, plan_cfg, scfg,
                       tag=tag, guide_ids=CFG1_GUIDE_IDS)
        wall = time.time() - t0
        s = st.summary()
        n = s["overall"]["n"]
        p = s["overall"]["success_rate"] / 100.0
        timing = s.get("timing", {})
        row = {"sampler": sampler, "steps": steps, "guidance_period": period,
               "success_pct": 100 * p,
               "se_pct": 100 * float(np.sqrt(max(p * (1 - p), 1e-9) / n)),
               "mean_plan_s": timing.get("mean_plan_s"),
               "wall_s": round(wall, 1),
               "per_scene": {str(i): bool(r["success"])
                             for i, r in st.completed.items()}}
        rows.append(row)
        print(json.dumps(row), flush=True)

    ref = rows[0]

    # paired McNemar vs the DDPM reference row: with the SAME scenes in
    # both arms the discordant pairs carry all the information — far more
    # power than two independent binomials at these n
    def mcnemar(r):
        ks = sorted(set(ref["per_scene"]) & set(r["per_scene"]))
        win = sum(r["per_scene"][k] and not ref["per_scene"][k] for k in ks)
        lose = sum(ref["per_scene"][k] and not r["per_scene"][k] for k in ks)
        n = len(ks)
        diff = (win - lose) / max(n, 1)
        se = float(np.sqrt(max(win + lose, 1)) / max(n, 1))
        return {"fast_only": win, "ddpm_only": lose,
                "z": (win - lose) / np.sqrt(max(win + lose, 1)),
                "diff_pct": 100 * diff, "diff_ci95_pct": 196 * se}

    for r in rows[1:]:
        r["paired_vs_ddpm"] = mcnemar(r)

    with open(os.path.join(args.results_dir, "ddim_cadence.json"), "w") as f:
        json.dump({"scenes": args.scenes, "seed": args.seed,
                   "rows": [{k: v for k, v in r.items() if k != "per_scene"}
                            for r in rows]}, f, indent=1)
    lines = [
        "# DDIM guidance-cadence study",
        "",
        f"{args.scenes} synthetic scenes (seed {args.seed}), cfg1 12-guide "
        "ensemble, trained model `models/synthetic_v3`; success = C++ "
        "oracle collision-free.  guidance_period = apply ensemble guidance "
        "every k-th coarse DDIM step (the DDPM row keeps the reference "
        "cadence: even t >= 6).",
        "",
        "| sampler | steps | guidance period | success % (± s.e.) | "
        "paired Δ vs DDPM (±95% CI) | McNemar z | mean plan s/scene |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        mark = " (reference cadence)" if r is ref else ""
        plan_s = (f"{r['mean_plan_s']:.3f}"
                  if r["mean_plan_s"] is not None else "—")
        mc = r.get("paired_vs_ddpm")
        delta = (f"{mc['diff_pct']:+.1f} ± {mc['diff_ci95_pct']:.1f}"
                 if mc else "—")
        z = f"{mc['z']:.2f}" if mc else "—"
        lines.append(
            f"| {r['sampler']}{mark} | {r['steps']} | "
            f"{r['guidance_period']} | {r['success_pct']:.1f} ± "
            f"{r['se_pct']:.1f} | {delta} | {z} | {plan_s} |")
    lines.append("")
    lines.append(
        "Paired columns: per-scene McNemar against the DDPM-255 row on the "
        "shared corpus; |z| < 2 = no significant quality difference.")
    lines.append("")
    best_fast = max((r for r in rows if r["sampler"] == "ddim"),
                    key=lambda r: (r["success_pct"],
                                   -(r["mean_plan_s"] or 1e9)))
    lines.append(
        f"**Frontier pick**: ddim{best_fast['steps']} with guidance every "
        f"{best_fast['guidance_period']} step(s) — "
        f"{best_fast['success_pct']:.1f}% vs the DDPM reference's "
        f"{ref['success_pct']:.1f}%.")
    lines.append("")
    with open(os.path.join(REPO, "docs", "ddim_cadence.md"), "w") as f:
        f.write("\n".join(lines))
    return 0


if __name__ == "__main__":
    sys.exit(main())
