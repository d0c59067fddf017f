"""Fast-mode (DDIM) MFU decomposition + fold re-optimization.

Round-3 gap (VERDICT): DDPM-255 runs at 47% MFU but the shipped fast mode
(DDIM-16/period-2) at ~25% — half the chip idle exactly where users run.
Hypothesis: the per-PROGRAM fixed work (IK goal filtering over ~800
candidates/scene, trust-region selection, swept-volume best-of-batch) is
negligible against 255 sampler steps but not against 16; and the S=21 fold
(tuned on DDPM) under-amortizes kernel-launch overhead for the short scan.

Method: measure a matrix of bench one-shots (same watchdog machinery as
bench.py --suite) —

  * DDIM-16/p2 over a fold sweep S in {21, 42, 63, 84}
  * DDIM-16 no-guidance at the same folds (guidance share)
  * DDPM-255 at S=21 (anchor)

then decompose per-call time as  t(S, steps) = f + S * (c_scene + steps *
c_step)  by regressing the fold sweep, and report the fixed-work share per
configuration.  Writes docs/ddim_mfu.md + results_r4/ddim_mfu.json.

Run (TPU): python -m tools.ddim_mfu_study
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, os.pardir))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="ddim_mfu_study")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--folds", default="21,42,63,84")
    ap.add_argument("--ddim-steps", type=int, default=16)
    ap.add_argument("--period", type=int, default=2)
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--results-dir", default=os.path.join(REPO, "results_r4"))
    args = ap.parse_args(argv)

    import bench

    folds = [int(x) for x in args.folds.split(",")]
    rows = []

    def run(tag, flags, alts=()):
        attempts = [flags] + [list(a) for a in alts]
        out = bench.measure(attempts, args.reps, args.timeout)
        if out is None:
            print(f"[skip] {tag}: all attempts timed out", flush=True)
            return None
        if out.get("mfu_pct", 0) and out["mfu_pct"] > 100:
            # tunnel anomaly: an execution answered without running (seen
            # once: 41912 scenes/s "measured") — discard, do not regress on it
            print(f"[discard] {tag}: implausible mfu {out['mfu_pct']}",
                  flush=True)
            return None
        out["tag"] = tag
        rows.append(out)
        print(json.dumps(out), flush=True)
        return out

    base = ["--sampler", "ddim", "--ddim-steps", str(args.ddim_steps),
            "--ddim-guidance-period", str(args.period)]
    for s in folds:
        run(f"ddim{args.ddim_steps}_p{args.period}_S{s}",
            base + ["--scenes", str(s)],
            alts=[base + ["--scenes", str(s + 1)]])
    for s in (folds[0], folds[-1]):
        run(f"ddim{args.ddim_steps}_noguide_S{s}",
            base + ["--scenes", str(s), "--no-guidance"],
            alts=[base + ["--scenes", str(s + 1), "--no-guidance"]])
    run("ddpm_S21", ["--scenes", "21"], alts=[["--scenes", "22"]])
    # safety-mode throughput cost (docs/assist_study.md best arm): goal
    # filtering + safety-aware selection are per-call fixed work, so their
    # share is largest exactly in fast mode
    run("ddpm_safe_S21", ["--scenes", "21", "--safe"],
        alts=[["--scenes", "22", "--safe"]])
    sbest = folds[-1]
    run(f"ddim{args.ddim_steps}_safe_S{sbest}",
        base + ["--scenes", str(sbest), "--safe"],
        alts=[base + ["--scenes", str(sbest + 1), "--safe"]])

    # ---- decomposition: t_call(S) = f + S * c  for the guided DDIM rows --
    sweep = [r for r in rows if r["tag"].startswith(
        f"ddim{args.ddim_steps}_p")]
    decomp = {}
    if len(sweep) >= 2:
        S = np.array([r["scenes"] for r in sweep], float)
        t_call = np.array([r["scenes"] / r["scenes_per_sec"] for r in sweep])
        c, f = np.polyfit(S, t_call, 1)  # t = c*S + f
        decomp = {
            "fixed_per_call_ms": round(1e3 * f, 3),
            "per_scene_ms": round(1e3 * c, 3),
            "fixed_share_at_S21_pct": round(100 * f / (f + 21 * c), 1),
            "fixed_share_at_Smax_pct": round(
                100 * f / (f + S.max() * c), 1),
        }
    out = {"rows": rows, "decomposition": decomp}
    os.makedirs(args.results_dir, exist_ok=True)
    with open(os.path.join(args.results_dir, "ddim_mfu.json"), "w") as fjs:
        json.dump(out, fjs, indent=1)

    best = max((r for r in sweep), key=lambda r: r["scenes_per_sec"],
               default=None)
    lines = [
        "# Fast-mode (DDIM) MFU decomposition",
        "",
        f"Matrix measured through the bench watchdog (reps={args.reps}); "
        "workload = cfg1 ensemble batch 120/scene, horizon 50, 8-obstacle "
        "scenes, full planning program (IK filter -> sampler -> selection).",
        "",
        "| config | scenes/s | TFLOP/s | MFU % |",
        "|---|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['tag']} | {r['scenes_per_sec']:.1f} | "
                     f"{r['tflops_per_sec']:.1f} | "
                     f"{r.get('mfu_pct', float('nan')):.1f} |")
    if decomp:
        lines += [
            "",
            "## Per-call decomposition (fold regression)",
            "",
            f"t_call(S) = {decomp['fixed_per_call_ms']} ms fixed + "
            f"{decomp['per_scene_ms']} ms x S scenes.",
            "",
            f"- fixed-work share at the DDPM-tuned S=21: "
            f"**{decomp['fixed_share_at_S21_pct']}%**",
            f"- at the largest measured fold: "
            f"{decomp['fixed_share_at_Smax_pct']}%",
        ]
    if best is not None:
        lines += ["",
                  f"**Fast-mode fold optimum in this matrix: S="
                  f"{best['scenes']} at {best['scenes_per_sec']:.1f} "
                  f"scenes/s, {best.get('mfu_pct')}% MFU.**"]
    lines.append("")
    with open(os.path.join(REPO, "docs", "ddim_mfu.md"), "w") as fmd:
        fmd.write("\n".join(lines))
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
