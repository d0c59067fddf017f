"""Attribute the planner's per-call fixed work (docs/ddim_mfu.md).

Derived from the step probe: at S=21 the plan program carries ~43 ms of
non-sampler work per call — negligible against 255 DDPM steps, ~44% of a
DDIM-16 call.  This probe times each candidate component standalone at the
same shapes:

  goal_select : vmapped IK trust-region filter (S x 800 candidates)
  selection   : swept_cost_per_sample on the (S*B, 50, 7) batch
  safety      : trajectory_safety_penalties on the same batch
  tiling      : tile_scene_per_sample + guide-ensemble tiling to S*B
  init        : x_T normal draw + endpoint pinning

Run (TPU): python -m tools.fixed_work_probe
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="fixed_work_probe")
    ap.add_argument("--scenes", type=int, default=21)
    ap.add_argument("--batch", type=int, default=120)
    ap.add_argument("--n-ik", type=int, default=800)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from edmp_tpu import planner as P
    from edmp_tpu.config import (CFG1_GUIDE_IDS, pack_ensemble,
                                 reference_guide_configs)
    from edmp_tpu.costs.assist import trajectory_safety_penalties
    from edmp_tpu.costs.guide import GuideParams, swept_cost_per_sample
    from edmp_tpu.costs.obstacles import pack_scene, tile_scene_per_sample
    from edmp_tpu.data import synthetic

    S, B = args.scenes, args.batch
    r = np.random.default_rng(0)
    scenes = jax.tree.map(lambda *xs: jnp.stack(xs), *[
        pack_scene(synthetic.random_obstacle_config(r, 8), max_obstacles=8)
        for _ in range(S)])
    gp, _ = pack_ensemble(reference_guide_configs(CFG1_GUIDE_IDS),
                          B // 12, 255)
    starts = jnp.asarray(r.uniform(-1, 1, (S, 7)), jnp.float32)
    goals = jnp.asarray(r.uniform(-1, 1, (S, args.n_ik, 7)), jnp.float32)
    valid = jnp.ones((S, args.n_ik), bool)
    trajs = jnp.asarray(r.normal(0, 0.8, (S * B, 50, 7)), jnp.float32)
    sample_scene = tile_scene_per_sample(scenes, B)
    start_s = jnp.repeat(starts, B, axis=0)

    import functools

    probes = {}

    def timed(label, fn, *xs):
        f = jax.jit(fn)
        y = f(*xs)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            y = f(*xs)
        jax.block_until_ready(y)
        ms = 1e3 * (time.perf_counter() - t0) / args.reps
        probes[label] = round(ms, 3)
        print(json.dumps({"probe": label, "call_ms": probes[label]}),
              flush=True)

    timed("goal_select",
          jax.vmap(functools.partial(P.select_goal, sc_filter=False),
                   in_axes=(0, 0, 0, 0, None)),
          goals, valid, starts, scenes, 8e-4)
    timed("goal_select_scfilter",
          jax.vmap(functools.partial(P.select_goal, sc_filter=True),
                   in_axes=(0, 0, 0, 0, None)),
          goals, valid, starts, scenes, 8e-4)
    timed("selection",
          lambda t, s, sc: swept_cost_per_sample(t[:, 1:-1, :], s, s, sc),
          trajs, start_s, sample_scene)
    timed("safety_penalties", trajectory_safety_penalties, trajs)
    timed("tiling",
          lambda sc, g: (tile_scene_per_sample(sc, B),
                         jnp.tile(g.clearance, (S, 1)),
                         jnp.tile(g.expansion, (S, 1)),
                         jnp.tile(g.guidance_schedule, (S, 1))),
          scenes, gp)
    timed("init_noise",
          lambda k: jax.random.normal(k, (S * B, 50, 7)), jax.random.key(0))
    print(json.dumps({"total_ms": round(sum(probes.values()), 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
