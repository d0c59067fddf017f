"""Device trace + kernel aggregation of the fast-mode (DDIM) plan program.

Captures a jax.profiler trace around ONE warm `make_batched_plan_fn` call
(DDIM-16/period-2, S=21 — the shipped fast mode) and aggregates the
trace.json.gz into per-category device-time totals, like the round-3 DDPM
analysis (docs/trace_plan_step.md).  Artifacts land in
results_r4/trace_ddim16/, summary printed as JSON.

Run (TPU): python -m tools.ddim_trace
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, os.pardir))
sys.path.insert(0, REPO)


def aggregate(trace_dir):
    """Sum device-op durations by name category from the xplane JSON."""
    paths = glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
    if not paths:
        return None
    with gzip.open(paths[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid names containing "TPU" / "/device"
    device_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "Device" in name:
                device_pids.add(ev["pid"])
    cats = {}
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        name = ev.get("name", "")
        if name.startswith("fusion"):
            key = "fusion"
        elif "conv" in name.lower():
            key = "convolution"
        elif name.startswith("copy") or "copy" in name.lower():
            key = "copy"
        elif "dynamic" in name.lower():
            key = "dynamic_slice/update"
        elif "while" in name.lower():
            key = "while(scan)"
        else:
            key = "other"
        cats[key] = cats.get(key, 0.0) + dur
        total += dur
    return {"total_device_ms": round(total, 2),
            "by_category_ms": {k: round(v, 2)
                               for k, v in sorted(cats.items(),
                                                  key=lambda kv: -kv[1])}}


def main(argv=None):
    ap = argparse.ArgumentParser(prog="ddim_trace")
    ap.add_argument("--scenes", type=int, default=21)
    ap.add_argument("--ddim-steps", type=int, default=16)
    ap.add_argument("--period", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "results_r4",
                                                  "trace_ddim16"))
    args = ap.parse_args(argv)

    import jax

    import bench

    model, sch, cfg, fargs = bench.build_workload(
        args.scenes, sampler="ddim", ddim_steps=args.ddim_steps,
        ddim_guidance_period=args.period)
    from edmp_tpu import planner as P

    fn = P.make_batched_plan_fn(model, sch, cfg)
    res = fn(*fargs)          # compile + warm
    jax.block_until_ready(res)
    t0 = time.perf_counter()
    res = fn(*fargs)
    jax.block_until_ready(res)
    call_ms = 1e3 * (time.perf_counter() - t0)

    os.makedirs(args.out, exist_ok=True)
    jax.profiler.start_trace(args.out)
    res = fn(*fargs)
    jax.block_until_ready(res)
    jax.profiler.stop_trace()

    summary = aggregate(args.out) or {}
    summary["warm_call_ms"] = round(call_ms, 2)
    summary["scenes"] = args.scenes
    summary["config"] = f"ddim{args.ddim_steps}_p{args.period}"
    print(json.dumps(summary, indent=1))
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
