"""DDIM guidance-cadence study (VERDICT r2 #9).

``denoise_guided_ddim`` goes beyond the reference (which always runs all
T=255 reverse steps) and is advertised as the 4x-faster mode — but its
guidance cadence was chosen, not tuned.  This study sweeps
(ddim_steps x guidance_period) against the DDPM-255 quality reference on a
fixed synthetic benchmark and commits the quality/speed frontier, giving the
advertised fast mode a tuning provenance.

Run (TPU): python -m tools.ddim_cadence_study --scenes 64
Writes docs/ddim_cadence.md + results_r3/ddim_cadence.json.
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
    ap.add_argument("--scenes", type=int, default=64)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--weights", default=os.path.join(
        REPO, "models", "synthetic_v3", "weights_inference.npz"))
    ap.add_argument("--results-dir", default=os.path.join(REPO, "results_r3"))
    ap.add_argument("--configs", default="ddpm:255:2,ddim:64:1,ddim:64:2,"
                    "ddim:32:1,ddim:32:2,ddim:16:1,ddim:16:2",
                    help="comma list of sampler:steps:period")
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
        tag = f"cad_{sampler}{steps}_p{period}"
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
               "wall_s": round(wall, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(os.path.join(args.results_dir, "ddim_cadence.json"), "w") as f:
        json.dump({"scenes": args.scenes, "seed": args.seed, "rows": rows},
                  f, indent=1)

    ref = rows[0]
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
        "mean plan s/scene |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        mark = " (reference cadence)" if r is ref else ""
        plan_s = (f"{r['mean_plan_s']:.3f}"
                  if r["mean_plan_s"] is not None else "—")
        lines.append(
            f"| {r['sampler']}{mark} | {r['steps']} | "
            f"{r['guidance_period']} | {r['success_pct']:.1f} ± "
            f"{r['se_pct']:.1f} | {plan_s} |")
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
