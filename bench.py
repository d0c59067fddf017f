"""Benchmark: cfg1-equivalent planning throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Workload (paper-replication shape, benchmark/cfgs/cfg1.yaml): 12-guide
ensemble x 10 samples = 120 trajectories/scene, T=255 reverse steps, horizon
50, ~8-obstacle scenes, IK goal filter + guided denoise + swept-volume
selection — the full planning pipeline, S scenes batched per device call.

Accounting (auditable):
  * FLOPs per scene from XLA's own cost model (compiled.cost_analysis()),
    cross-checked against an analytic conv-pyramid count (utils/flops.py);
    tflops_per_sec and mfu_pct are derived from the measured wall time and
    the chip's published bf16 peak (TPU MXUs run default-precision f32
    convs as bf16 passes, so the bf16 peak is the correct denominator).
  * vs_baseline: ratio against a FAIR serial execution of the same math --
    one scene at a time, one jitted step per reverse timestep dispatched
    from a Python loop with state kept ON DEVICE (the reference's per-step
    loop structure, diffusion/diffusion.py:314, minus its host<->device
    copies, which would only make the baseline slower).  Measured with
    --measure-baseline, cached in bench_baseline.json.

--suite runs the full matrix (S-scaling, 1x1024 large batch, Pallas A/B,
DDIM) and writes bench_details.json next to this file.
"""

import argparse
import json
import os
import time

import numpy as np

# Persistent compilation cache: the 255-step fused plan is a large XLA
# program; caching makes driver re-runs start in seconds.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(HERE, "bench_baseline.json")
DETAILS_FILE = os.path.join(HERE, "bench_details.json")

# cfg1 workload shape
NUM_GUIDES = 12
SAMPLES_PER_GUIDE = 10
BATCH = NUM_GUIDES * SAMPLES_PER_GUIDE
T_STEPS = 255
TRAJ_LEN = 50
N_OBSTACLES = 8
N_IK = 32

# Published dense peak (TFLOP/s, bf16) per chip generation ("v5 lite" is
# the device_kind string v5e reports).
PEAK_TFLOPS = {"v4": 275.0, "v5e": 197.0, "v5lite": 197.0, "v5p": 459.0,
               "v6e": 918.0, "v6lite": 918.0, "v6p": 1153.0}


def _device_peak_tflops():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, peak in PEAK_TFLOPS.items():
        if key in kind.replace(" ", ""):
            return peak, kind
    return None, kind


def build_workload(n_scenes, sampler="ddpm", ddim_steps=32, bf16=False,
                   use_pallas=False, batch=BATCH, no_guidance=False,
                   guidance_engine="auto", ddim_guidance_period=1,
                   safe=False):
    import jax
    import jax.numpy as jnp

    from edmp_tpu import planner as P
    from edmp_tpu.config import (CFG1_GUIDE_IDS, pack_ensemble,
                                 reference_guide_configs)
    from edmp_tpu.costs.obstacles import pack_scene
    from edmp_tpu.data import synthetic
    from edmp_tpu.diffusion.schedule import make_schedule
    from edmp_tpu.models import temporal_unet as tu

    rng = np.random.default_rng(0)
    # the real cfg1 ensemble hyperparameters (12 guides); for non-multiple
    # batches the per-guide rows stretch evenly
    spg = max(batch // NUM_GUIDES, 1)
    gp, _ = pack_ensemble(reference_guide_configs(CFG1_GUIDE_IDS), spg,
                          T_STEPS)
    if gp.batch != batch:  # tile/trim to the requested batch
        reps = -(-batch // gp.batch)
        gp = type(gp)(*[
            (None if a is None else
             jnp.tile(a, (reps,) + (1,) * (a.ndim - 1))[:batch])
            for a in gp])

    model = tu.create_model(dtype=jnp.bfloat16 if bf16 else None,
                            use_pallas=use_pallas)
    # host-side init: eval_shape + numpy fill (values are irrelevant for
    # throughput; avoids a ~3 min device compile of model.init via tunnel)
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, TRAJ_LEN, 7)), jnp.ones(1)),
        jax.random.key(0))["params"]
    host = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(host.normal(0, 0.02, s.shape), s.dtype), shapes)
    sch = make_schedule(T_STEPS)
    cfg = P.PlannerConfig(
        batch_size=batch, traj_len=TRAJ_LEN, sampler=sampler,
        ddim_steps=ddim_steps,
        # DDIM ignores guidance_min_t; period <= 0 is its no-guidance form
        ddim_guidance_period=(0 if no_guidance else ddim_guidance_period),
        guidance_engine=guidance_engine,
        # the measured-best quality mode (docs/assist_study.md): sc-filtered
        # goals + safety-aware selection
        sc_filter_goals=safe, safety_aware_selection=safe,
        # guidance_min_t above T disables every guided step: the A/B that
        # isolates the guidance engine's share of the fused scan
        guidance_min_t=T_STEPS + 2 if no_guidance else 5)

    scenes, starts, goals, valids = [], [], [], []
    for _ in range(n_scenes):
        oc, st, gl, va = synthetic.random_problem(rng, N_OBSTACLES, N_IK)
        # dataset-aware padding (mirrors run_sweep): the guidance adjoint is
        # VPU-bound and linear in the PADDED obstacle count, so pad to the
        # workload's true count, not the MAX_OBSTACLES ceiling
        scenes.append(pack_scene(oc, max_obstacles=N_OBSTACLES))
        starts.append(st)
        goals.append(gl)
        valids.append(va)
    scene_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    args = (
        params, scene_batch, gp,
        jnp.asarray(np.stack(starts), jnp.float32),
        jnp.asarray(np.stack(goals), jnp.float32),
        jnp.asarray(np.stack(valids)),
        jax.random.key(1),
    )
    return model, sch, cfg, args


def run_tpu(n_scenes, reps, sampler="ddpm", ddim_steps=32, bf16=False,
            use_pallas=False, batch=BATCH, no_guidance=False,
            guidance_engine="auto", ddim_guidance_period=1, safe=False):
    """Measure one configuration.  Returns a result dict with throughput and
    FLOP accounting."""
    import jax

    from edmp_tpu import planner as P
    from edmp_tpu.utils.flops import plan_flops_analytic

    model, sch, cfg, args = build_workload(
        n_scenes, sampler, ddim_steps, bf16, use_pallas, batch, no_guidance,
        guidance_engine, ddim_guidance_period, safe)
    fn = P.make_batched_plan_fn(model, sch, cfg)

    # XLA cost analysis PER CONFIG: Lowered.cost_analysis() runs the HLO
    # cost model locally (no remote device compile), so every
    # bench_details.json row carries the cross-check figure.  Remember the
    # scan-body caveat: XLA counts each lax.scan body ONCE, not times trip
    # count, so this is a program-BODY number — the analytic model below is
    # the authoritative per-scene count (tests/test_flops.py).
    xla_flops = None
    call = fn
    try:
        ca = fn.lower(*args).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        if ca and ca.get("flops"):
            xla_flops = float(ca["flops"])
    except Exception:
        pass
    if xla_flops is None:
        # the axon PJRT plugin returns None from client-side cost analysis;
        # lower the IDENTICAL program for the CPU backend in a subprocess
        # (abstract lowering only — nothing executes) and read the HLO cost
        # model there
        xla_flops = _cpu_cost_analysis(
            n_scenes, sampler, ddim_steps, bf16, use_pallas, batch,
            no_guidance, guidance_engine, ddim_guidance_period, safe)
    # full AOT compile stays opt-in: it has been observed to hang through
    # the remote-compile tunnel
    if os.environ.get("EDMP_BENCH_AOT"):
        try:
            compiled = fn.lower(*args).compile()
            call = compiled
        except Exception:
            pass

    res = call(*args)  # warm (AOT: executes; JIT fallback: compiles)
    jax.block_until_ready(res)

    t0 = time.perf_counter()
    for _ in range(reps):
        res = call(*args)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0

    scenes_per_sec = n_scenes * reps / dt
    if sampler == "ddpm":
        n_steps = T_STEPS
        guided_steps = len(range(6, T_STEPS + 1, 2))
    else:
        # the sampler's tau subsequence collapses duplicates
        # (np.unique(round(linspace))), so the real step count K can be
        # below --ddim-steps as it approaches T; count FLOPs over K
        n_steps = len(np.unique(
            np.round(np.linspace(T_STEPS, 1, ddim_steps))))
        guided_steps = -(-n_steps // max(ddim_guidance_period, 1))
    if no_guidance:
        guided_steps = 0
    analytic = plan_flops_analytic(
        batch=batch, traj_len=TRAJ_LEN, n_steps=n_steps,
        guided_steps=guided_steps, n_obstacles=N_OBSTACLES) * n_scenes
    # tflops/mfu use the ANALYTIC count (validated against XLA's cost model
    # layer-by-layer in tests/test_flops.py): XLA's whole-program number
    # counts each lax.scan body ONCE, not times trip count, so it
    # underestimates the sampler by ~the scan length.
    tflops = analytic * reps / dt / 1e12
    peak, kind = _device_peak_tflops()
    out = {
        "scenes": n_scenes, "batch": batch, "reps": reps,
        "sampler": sampler, "bf16": bf16, "use_pallas": use_pallas,
        "no_guidance": no_guidance, "guidance_engine": guidance_engine,
        "safe": safe,
        **({"ddim_steps": ddim_steps,
            "ddim_guidance_period": ddim_guidance_period}
           if sampler == "ddim" else {}),
        "scenes_per_sec": round(scenes_per_sec, 4),
        "sec_per_scene": round(1.0 / scenes_per_sec, 5),
        "flops_per_scene_analytic": round(analytic / n_scenes),
        "flops_xla_program_body": round(xla_flops) if xla_flops else None,
        "tflops_per_sec": round(tflops, 2),
        "device_kind": kind,
    }
    if peak:
        out["peak_tflops_bf16"] = peak
        out["mfu_pct"] = round(100.0 * tflops / peak, 2)
    return out


def _cpu_cost_analysis(*workload_args, timeout_s=480):
    """HLO cost-model flops of the plan program, via a CPU-backend
    subprocess (abstract lowering, no execution).

    Failures are LOUD (r4 verdict item: the round-4 version swallowed every
    exception and silently left flops_xla_program_body null in
    bench_details.json): the subprocess's stderr tail and the failure mode
    are printed to stderr, and the caller records the null knowingly.
    """
    import subprocess
    import sys

    code = (
        "import json, sys\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "sys.path.insert(0, %r)\n"
        "import bench\n"
        "from edmp_tpu import planner as P\n"
        "model, sch, cfg, args = bench.build_workload(*json.loads(sys.argv[1]))\n"
        "fn = P.make_batched_plan_fn(model, sch, cfg)\n"
        "ca = fn.lower(*args).cost_analysis()\n"
        "if isinstance(ca, (list, tuple)): ca = ca[0] if ca else {}\n"
        "print('FLOPS', (ca or {}).get('flops'))\n"
    ) % HERE
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)

    def _loud(reason):
        print(f"[flops] cpu cost-analysis FAILED ({reason}); "
              f"flops_xla_program_body will be null for this row",
              file=sys.stderr, flush=True)

    try:
        p = subprocess.run(
            [sys.executable, "-c", code, json.dumps(list(workload_args))],
            capture_output=True, text=True, timeout=timeout_s, env=env)
    except subprocess.TimeoutExpired:
        _loud(f"timeout after {timeout_s}s")
        return None
    except Exception as e:
        _loud(f"{type(e).__name__}: {e}")
        return None
    for ln in (p.stdout or "").splitlines():
        if ln.startswith("FLOPS ") and ln.split()[1] != "None":
            return float(ln.split()[1])
    tail = (p.stderr or "").strip().splitlines()[-3:]
    _loud(f"rc={p.returncode}, no FLOPS line; stderr tail: "
          + " | ".join(tail))
    return None


def run_serial_baseline():
    """FAIR serial baseline: the reference's per-step loop structure (one
    scene, 255 sequential Python-dispatched steps, guidance every even t>=5)
    with all state device-resident — no host round-trips inside the loop.
    The actual reference also pays a host<->device copy per step
    (diffusion.py:319-322) and host numpy posterior math, so this bound is
    GENEROUS to the baseline."""
    import jax
    import jax.numpy as jnp

    from edmp_tpu import planner as P
    from edmp_tpu.costs.guide import guidance_gradient
    from edmp_tpu.costs.obstacles import obstacle_aabbs
    from edmp_tpu.diffusion.sampler import clip_joints
    from edmp_tpu.costs.guide import swept_cost_per_sample

    model, sch, cfg, args = build_workload(1)
    params, scene_b, gp, starts, goals_b, valids, _ = args
    scene = jax.tree.map(lambda x: x[0], scene_b)
    start = starts[0]

    apply_fn = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))
    goal_fn = jax.jit(P.select_goal, static_argnums=(4,))

    @jax.jit
    def model_step(x, t, z):
        eps = apply_fn(params, x, t[None].astype(jnp.float32))
        ti = t.astype(jnp.int32)
        a, ab, b = sch.alpha[ti - 1], sch.alpha_bar[ti - 1], sch.beta[ti - 1]
        return (x - ((1 - a) / jnp.sqrt(1 - ab)) * eps) / jnp.sqrt(a) + b * z

    @jax.jit
    def guide_step(x, t, start, goal):
        ti = t.astype(jnp.int32)
        interior = clip_joints(x[:, 1:-1])
        lo, hi = obstacle_aabbs(scene, expansion=gp.expansion[:, ti - 1],
                                clearance=gp.clearance[:, ti - 1])
        B = x.shape[0]
        lo = jnp.broadcast_to(lo, (B,) + lo.shape[-2:])
        hi = jnp.broadcast_to(hi, (B,) + hi.shape[-2:])
        g = guidance_gradient(interior, start, goal, lo, hi, gp)
        scale = gp.guidance_schedule[:, ti - 1][:, None, None]
        x = x.at[:, 1:-1].add(-scale * g)
        x = x.at[:, 0].set(start)
        x = x.at[:, -1].set(goal)
        return x

    def one_scene(seed):
        rng = np.random.default_rng(seed)
        goal = goal_fn(goals_b[0], valids[0], start, scene, 8e-4)
        x = jnp.asarray(rng.standard_normal((BATCH, TRAJ_LEN, 7)),
                        jnp.float32)
        x = x.at[:, 0].set(start).at[:, -1].set(goal)
        for t in range(T_STEPS, 0, -1):
            z = (jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
                 if t > 1 else jnp.zeros_like(x))
            x = model_step(x, jnp.asarray(float(t)), z)
            if (t % 2) < 1 and t >= 5:
                x = guide_step(x, jnp.asarray(float(t)), start, goal)
            else:
                x = x.at[:, 0].set(start).at[:, -1].set(goal)
        costs = swept_cost_per_sample(x[:, 1:-1], start, goal, scene)
        return x[jnp.argmin(costs)]

    jax.block_until_ready(one_scene(0))  # warm the per-step compiles
    t0 = time.perf_counter()
    jax.block_until_ready(one_scene(1))
    return 1.0 / (time.perf_counter() - t0)


# ---------------------------------------------------------------------------
# Watchdog execution: the remote-compile service intermittently HANGS when
# re-asked for a program an earlier process already compiled (and a killed
# in-flight compile burns that program hash for the session).  Every
# measurement therefore runs in a killable subprocess with a timeout, and on
# timeout the config retries with a slightly different scene count — a fresh
# program hash.  --direct bypasses this (in-process, no watchdog).
# ---------------------------------------------------------------------------

def _oneshot(flags, timeout_s):
    import subprocess
    import sys

    cmd = [sys.executable, os.path.abspath(__file__), "--oneshot-json",
           "--direct"] + flags
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None
    for ln in reversed((p.stdout or "").strip().splitlines()):
        try:
            return json.loads(ln)
        except json.JSONDecodeError:
            continue
    return None


def measure(attempts, reps, timeout_s=900):
    """Try each flag-list attempt in a watchdog subprocess; first success
    wins.  Returns the run_tpu details dict or None."""
    for flags in attempts:
        out = _oneshot(list(flags) + ["--reps", str(reps)], timeout_s)
        if out is not None:
            return out
        print(f"[watchdog] attempt {flags} timed out; trying a fresh shape",
              flush=True)
    return None


def _alt_scenes(flags_fn, scene_options):
    return [flags_fn(s) for s in scene_options]


def run_suite(reps, quick=False):
    """The measured matrix -> bench_details.json (every config through the
    watchdog with scene-count fallbacks; the file is rewritten after EVERY
    config, so a timeout/kill keeps the completed rows).  ``quick`` runs the
    6 headline configs only."""
    if quick:
        specs = [
            _alt_scenes(lambda s: ["--scenes", str(s)], (21, 22)),
            _alt_scenes(lambda s: ["--scenes", str(s), "--safe"], (21, 22)),
            _alt_scenes(lambda s: ["--scenes", str(s), "--sampler", "ddim",
                                   "--ddim-steps", "16",
                                   "--ddim-guidance-period", "2"], (21, 22)),
            _alt_scenes(lambda s: ["--scenes", str(s), "--sampler", "ddim",
                                   "--ddim-steps", "16",
                                   "--ddim-guidance-period", "2", "--safe"],
                        (21, 22)),
            [["--scenes", "1", "--batch", "1200"],
             ["--scenes", "1", "--batch", "1216"]],
            _alt_scenes(lambda s: ["--scenes", str(s), "--no-guidance"],
                        (21, 22)),
        ]
        return _run_specs(specs, reps)
    # README-critical headline rows FIRST: the file is written after every
    # config, so a wall-clock truncation still leaves the table's rows
    specs = [
        _alt_scenes(lambda s: ["--scenes", str(s)], (21, 25)),
        # quality-matched fast mode (docs/ddim_cadence.md) + its safe variant
        _alt_scenes(lambda s: ["--scenes", str(s), "--sampler", "ddim",
                               "--ddim-steps", "16",
                               "--ddim-guidance-period", "2"], (21, 22)),
        _alt_scenes(lambda s: ["--scenes", str(s), "--sampler", "ddim",
                               "--ddim-steps", "16",
                               "--ddim-guidance-period", "2", "--safe"],
                    (21, 22)),
        # safety mode overhead at the headline fold
        _alt_scenes(lambda s: ["--scenes", str(s), "--safe"], (21, 22)),
        # BASELINE 'single scene, 1000+ trajectories'
        [["--scenes", "1", "--batch", "1200"],
         ["--scenes", "1", "--batch", "1216"]],
        # guidance-share A/B: every guided step disabled
        _alt_scenes(lambda s: ["--scenes", str(s), "--no-guidance"],
                    (21, 22)),
        # guidance structure with zero gradient math (dispatch-cost probe)
        _alt_scenes(lambda s: ["--scenes", str(s), "--guidance-engine",
                               "noop"], (21, 22)),
        _alt_scenes(
            lambda s: ["--scenes", str(s), "--sampler", "ddim"], (21, 22)),
        # S-scaling
        _alt_scenes(lambda s: ["--scenes", str(s)], (17, 19)),
        _alt_scenes(lambda s: ["--scenes", str(s)], (6, 7)),
        _alt_scenes(lambda s: ["--scenes", str(s)], (9, 10)),
        # fused Pallas guidance-gradient kernel A/B (costs/pallas_grad.py)
        _alt_scenes(lambda s: ["--scenes", str(s), "--guidance-engine",
                               "pallas"], (17, 19)),
        _alt_scenes(lambda s: ["--scenes", str(s), "--guidance-engine",
                               "pallas"], (6, 7)),
        # bf16, Pallas fused-conv A/B
        _alt_scenes(lambda s: ["--scenes", str(s), "--bf16"], (6, 7)),
        _alt_scenes(lambda s: ["--scenes", str(s), "--use-pallas"], (6, 7)),
    ]
    return _run_specs(specs, reps)


def _run_specs(specs, reps):
    details = {"configs": []}
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            details["serial_baseline"] = json.load(f)
    for attempts in specs:
        out = measure(attempts, reps)
        if out is not None:
            details["configs"].append(out)
            print(json.dumps(out), flush=True)
            with open(DETAILS_FILE, "w") as f:  # crash-safe incremental
                json.dump(details, f, indent=1)
    return details


def main():
    ap = argparse.ArgumentParser()
    # default fold = the measured S-scaling optimum: 21.4 (S=6) -> 23.7
    # (S=17) -> 24.39 (S=21) == 24.39 (S=25) -> 23.2 (S=29) -> 23.0 (S=33);
    # the flat top is S=21-25 and S=21 has the smaller working set
    ap.add_argument("--scenes", type=int, default=21)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--measure-baseline", action="store_true")
    ap.add_argument("--suite", action="store_true",
                    help="run the full matrix and write bench_details.json")
    ap.add_argument("--suite-quick", action="store_true",
                    help="6 headline configs only (crash-safe incremental)")
    ap.add_argument("--sampler", choices=["ddpm", "ddim"], default="ddpm")
    ap.add_argument("--ddim-steps", type=int, default=32)
    ap.add_argument("--ddim-guidance-period", type=int, default=1,
                    help="guide every k-th DDIM coarse step (2 matches "
                    "DDPM-255 quality, docs/ddim_cadence.md)")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 conv/dense compute in the denoiser")
    ap.add_argument("--use-pallas", action="store_true",
                    help="fused Pallas Conv1dBlock kernels in the denoiser")
    ap.add_argument("--guidance-engine", default="auto",
                    choices=["auto", "manual", "pallas", "fast", "noop"],
                    help="guidance-gradient engine (pallas = fused VMEM "
                    "kernel, costs/pallas_grad.py)")
    ap.add_argument("--no-guidance", action="store_true",
                    help="disable all guided steps (guidance-share A/B)")
    ap.add_argument("--safe", action="store_true",
                    help="safety mode: sc-filtered goals + safety-aware "
                    "selection (docs/assist_study.md best arm)")
    ap.add_argument("--direct", action="store_true",
                    help="run in-process (no watchdog subprocess)")
    ap.add_argument("--oneshot-json", action="store_true",
                    help="print the full run_tpu details dict as one JSON "
                    "line (watchdog child mode)")
    args = ap.parse_args()

    if args.measure_baseline:
        sps = run_serial_baseline()
        with open(BASELINE_FILE, "w") as f:
            json.dump({"serial_scenes_per_sec": sps,
                       "description": "fair device-resident per-step serial "
                       "loop, 1 scene x batch 120, jit per step"}, f)
        print(json.dumps({"metric": "serial_baseline_scenes_per_sec",
                          "value": round(sps, 5), "unit": "scenes/s",
                          "vs_baseline": 1.0}))
        return

    if args.oneshot_json:
        out = run_tpu(args.scenes, args.reps, args.sampler, args.ddim_steps,
                      args.bf16, args.use_pallas, args.batch,
                      args.no_guidance, args.guidance_engine,
                      args.ddim_guidance_period, args.safe)
        print(json.dumps(out))
        return

    if args.suite or args.suite_quick:
        details = run_suite(args.reps, quick=args.suite_quick)
        if not details["configs"]:
            print(json.dumps({"metric": "scenes_per_sec_cfg1", "value": None,
                              "unit": "scenes/s", "vs_baseline": None,
                              "error": "all watchdog attempts timed out"}))
            return
        head = details["configs"][0]
    elif args.direct:
        head = run_tpu(args.scenes, args.reps, args.sampler, args.ddim_steps,
                       args.bf16, args.use_pallas, args.batch,
                       args.no_guidance, args.guidance_engine,
                       args.ddim_guidance_period, args.safe)
    else:
        # default (driver) path: watchdog + fresh-shape fallback so a
        # poisoned program hash cannot hang the round's bench record
        def flags(s):
            f = ["--scenes", str(s), "--batch", str(args.batch),
                 "--sampler", args.sampler, "--ddim-steps",
                 str(args.ddim_steps),
                 "--ddim-guidance-period", str(args.ddim_guidance_period),
                 "--guidance-engine", args.guidance_engine]
            if args.bf16:
                f.append("--bf16")
            if args.use_pallas:
                f.append("--use-pallas")
            if args.no_guidance:
                f.append("--no-guidance")
            if args.safe:
                f.append("--safe")
            return f

        head = measure([flags(args.scenes), flags(args.scenes + 6),
                        flags(args.scenes + 10)], args.reps)
        if head is None:
            print(json.dumps({"metric": "scenes_per_sec_cfg1", "value": None,
                              "unit": "scenes/s", "vs_baseline": None,
                              "error": "all watchdog attempts timed out"}))
            return

    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f).get("serial_scenes_per_sec")
    vs = head["scenes_per_sec"] / baseline if baseline else None
    metric = ("scenes_per_sec_cfg1" if head["sampler"] == "ddpm"
              else f"scenes_per_sec_ddim{args.ddim_steps}")
    if head["bf16"]:
        metric += "_bf16"
    if head["use_pallas"]:
        metric += "_pallas"
    if head.get("guidance_engine", "auto") not in ("auto", "manual"):
        metric += f"_g{head['guidance_engine']}"
    if head.get("no_guidance"):
        metric += "_noguide"
    if head.get("safe"):
        metric += "_safe"
    line = {"metric": metric, "value": head["scenes_per_sec"],
            "unit": "scenes/s",
            "vs_baseline": round(vs, 2) if vs else None,
            "tflops_per_sec": head["tflops_per_sec"],
            "mfu_pct": head.get("mfu_pct"),
            "flops_per_scene": head["flops_per_scene_analytic"]}
    if head.get("flops_xla_program_body"):
        line["flops_xla_program_body"] = head["flops_xla_program_body"]
    print(json.dumps(line))


if __name__ == "__main__":
    main()
