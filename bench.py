"""Benchmark: cfg1-equivalent planning throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (paper-replication shape, benchmark/cfgs/cfg1.yaml): 12-guide
ensemble x 10 samples = 120 trajectories/scene, T=255 reverse steps, horizon
50, ~8-obstacle scenes, IK goal filter + guided denoise + swept-volume
selection — the full planning pipeline, S scenes batched per device call.

vs_baseline: ratio against a serial per-step host-loop execution of the same
math (the reference's execution model: 255 Python-loop steps with host
round-trips, one scene at a time).  The true PyTorch reference is not runnable
in this image (no pybullet/robofin/datasets/weights), so the serial baseline
is measured locally once with --measure-baseline and cached in
bench_baseline.json.
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

BASELINE_FILE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")

# cfg1 workload shape
NUM_GUIDES = 12
SAMPLES_PER_GUIDE = 10
BATCH = NUM_GUIDES * SAMPLES_PER_GUIDE
T_STEPS = 255
TRAJ_LEN = 50
N_OBSTACLES = 8
N_IK = 32


def build_workload(n_scenes, sampler="ddpm", ddim_steps=32, bf16=False):
    import jax
    import jax.numpy as jnp

    from edmp_tpu import planner as P
    from edmp_tpu.config import GuideConfig, pack_ensemble
    from edmp_tpu.costs.obstacles import pack_scene
    from edmp_tpu.data import synthetic
    from edmp_tpu.diffusion.schedule import make_schedule
    from edmp_tpu.models import temporal_unet as tu

    rng = np.random.default_rng(0)
    seg = (((150, 255), (0.0, 0.0)), ((20, 150), (0.0, 0.0)), ((0, 20), (0.0, 0.0)))
    guides = []
    for i in range(NUM_GUIDES):
        guides.append(GuideConfig(
            clearance_range=(0.02 + 0.01 * i, 0.02 + 0.01 * i),
            expansion_segments=seg if i % 3 else
            (((80, 255), (0.4, 0.4)), ((20, 80), (0.0, 0.0)), ((0, 20), (0.0, 0.0))),
            guidance_method="sv" if i % 2 else "iv",
            grad_norm=bool(i % 4 == 3),
            schedule_type="varying" if i % 2 else "constant",
            scale_val=0.05,
            volume_trust_region=8e-4,
        ))
    gp, _ = pack_ensemble(guides, SAMPLES_PER_GUIDE, T_STEPS)

    model = tu.create_model(dtype=jnp.bfloat16 if bf16 else None)
    # host-side init: eval_shape + numpy fill (values are irrelevant for
    # throughput; avoids a ~3 min device compile of model.init via tunnel)
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, TRAJ_LEN, 7)), jnp.ones(1)),
        jax.random.key(0))["params"]
    host = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(host.normal(0, 0.02, s.shape), s.dtype), shapes)
    sch = make_schedule(T_STEPS)
    cfg = P.PlannerConfig(batch_size=BATCH, traj_len=TRAJ_LEN,
                          sampler=sampler, ddim_steps=ddim_steps)

    scenes, starts, goals, valids = [], [], [], []
    for _ in range(n_scenes):
        oc, st, gl, va = synthetic.random_problem(rng, N_OBSTACLES, N_IK)
        scenes.append(pack_scene(oc))
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


def run_tpu(n_scenes, reps, sampler="ddpm", ddim_steps=32, bf16=False):
    import jax

    from edmp_tpu import planner as P

    model, sch, cfg, args = build_workload(n_scenes, sampler, ddim_steps, bf16)
    fn = P.make_batched_plan_fn(model, sch, cfg)

    res = fn(*args)  # compile + warm
    jax.block_until_ready(res)

    t0 = time.perf_counter()
    for _ in range(reps):
        res = fn(*args)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0
    return n_scenes * reps / dt


def run_serial_baseline():
    """Reference execution model: one scene, per-step Python loop, host
    round-trips between every step (numpy state on host)."""
    import jax
    import jax.numpy as jnp

    from edmp_tpu import planner as P
    from edmp_tpu.costs.guide import guidance_gradient
    from edmp_tpu.costs.obstacles import obstacle_aabbs
    from edmp_tpu.diffusion.sampler import clip_joints

    model, sch, cfg, args = build_workload(1)
    params, scene_b, gp, starts, goals_b, valids, keys = args
    scene = jax.tree.map(lambda x: x[0], scene_b)
    start = starts[0]

    apply_fn = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))
    grad_fn = jax.jit(guidance_gradient)
    goal_fn = jax.jit(P.select_goal, static_argnums=(4,))

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    goal = np.asarray(goal_fn(goals_b[0], valids[0], start, scene, 8e-4))
    x = rng.standard_normal((BATCH, TRAJ_LEN, 7)).astype(np.float32)
    x[:, 0], x[:, -1] = np.asarray(start), goal
    beta = np.asarray(sch.beta)
    alpha = np.asarray(sch.alpha)
    alpha_bar = np.asarray(sch.alpha_bar)
    exp_np = np.asarray(gp.expansion)
    cl_np = np.asarray(gp.clearance)
    sched_np = np.asarray(gp.guidance_schedule)
    for t in range(T_STEPS, 0, -1):
        eps = np.asarray(apply_fn(params, jnp.asarray(x), jnp.asarray([float(t)])))
        z = rng.standard_normal(x.shape) if t > 1 else 0.0
        x = (x - ((1 - alpha[t - 1]) / np.sqrt(1 - alpha_bar[t - 1])) * eps) \
            / np.sqrt(alpha[t - 1]) + beta[t - 1] * z
        x = x.astype(np.float32)
        if (t % 2) < 1 and t >= 5:
            interior = np.asarray(clip_joints(jnp.asarray(x[:, 1:-1])))
            lo, hi = obstacle_aabbs(scene, expansion=jnp.asarray(exp_np[:, t - 1]),
                                    clearance=jnp.asarray(cl_np[:, t - 1]))
            g = np.asarray(grad_fn(jnp.asarray(interior), jnp.asarray(start),
                                   jnp.asarray(goal), lo, hi, gp))
            x[:, 1:-1] -= sched_np[:, t - 1, None, None] * g
        x[:, 0], x[:, -1] = np.asarray(start), goal
    from edmp_tpu.costs.guide import swept_cost_per_sample

    costs = np.asarray(swept_cost_per_sample(jnp.asarray(x[:, 1:-1]),
                                             jnp.asarray(start),
                                             jnp.asarray(goal), scene))
    _ = x[np.argmin(costs)]
    return 1.0 / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--measure-baseline", action="store_true")
    ap.add_argument("--sampler", choices=["ddpm", "ddim"], default="ddpm")
    ap.add_argument("--ddim-steps", type=int, default=32)
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 conv/dense compute in the denoiser")
    args = ap.parse_args()

    if args.measure_baseline:
        sps = run_serial_baseline()
        with open(BASELINE_FILE, "w") as f:
            json.dump({"serial_scenes_per_sec": sps}, f)
        print(json.dumps({"metric": "serial_baseline_scenes_per_sec",
                          "value": sps, "unit": "scenes/s",
                          "vs_baseline": 1.0}))
        return

    value = run_tpu(args.scenes, args.reps, args.sampler, args.ddim_steps,
                    args.bf16)
    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f).get("serial_scenes_per_sec")
    vs = value / baseline if baseline else None
    metric = ("scenes_per_sec_cfg1" if args.sampler == "ddpm"
              else f"scenes_per_sec_ddim{args.ddim_steps}")
    if args.bf16:
        metric += "_bf16"
    print(json.dumps({"metric": metric, "value": round(value, 4),
                      "unit": "scenes/s",
                      "vs_baseline": round(vs, 2) if vs else None}))


if __name__ == "__main__":
    main()
