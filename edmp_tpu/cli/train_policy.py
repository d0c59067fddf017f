"""Policy-baseline training CLI (L11).

The reference repo carries the MPiNets trainer class but never instantiates
it (``mpinets/model.py:94-352`` — no in-repo caller, no data loader).  This
driver makes the TPU-native port actually runnable: synthetic one-step
expert batches (``data/pointcloud.policy_batch``) or caller-provided npz
batches, the reference's Adam(1e-4) + weighted point-match/collision loss,
and periodic rollout validation (final-EE error + sphere-model collision
rate, mpinets/model.py:252-318).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="edmp-train-policy")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--robot-points", type=int, default=1024)
    ap.add_argument("--obstacle-points", type=int, default=1024)
    ap.add_argument("--point-match-weight", type=float, default=1.0)
    ap.add_argument("--collision-weight", type=float, default=5.0)
    ap.add_argument("--log-every", type=int, default=20)
    ap.add_argument("--validate-every", type=int, default=0,
                    help="0 disables rollout validation")
    ap.add_argument("--rollout-length", type=int, default=69)
    ap.add_argument("--ckpt-dir", default=None,
                    help="save final params as <dir>/policy_params.npz")
    ap.add_argument("--batch-pool", type=int, default=0,
                    help="pre-generate this many batches and cycle them: "
                    "host-side cloud sampling is ~100 ms/example, which "
                    "starves the device when generated per step")
    ap.add_argument("--corpus", default=None,
                    help="behavior-clone a planner-distilled corpus "
                    "(tools/distill.py output dir) instead of synthetic "
                    "one-step batches; adds the target point-cloud segment")
    ap.add_argument("--target-points", type=int, default=128,
                    help="target-segment cloud size (corpus mode)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from edmp_tpu.data.pointcloud import policy_batch
    from edmp_tpu.models.policy import (init_policy, make_train_step,
                                        make_validate_fn, save_policy_params)

    rng = np.random.default_rng(args.seed)
    batcher = None
    if args.corpus:
        from edmp_tpu.data.pointcloud import CorpusPolicyBatcher

        batcher = CorpusPolicyBatcher(
            args.corpus, num_robot_points=args.robot_points,
            num_obstacle_points=args.obstacle_points - args.target_points,
            num_target_points=args.target_points, seed=args.seed)
        print(f"corpus: {len(batcher.trajs)} trajectories over "
              f"{len(batcher.scenes)} scenes")
        n_points = batcher.num_points
    else:
        n_points = args.robot_points + args.obstacle_points
    model, params = init_policy(jax.random.key(args.seed),
                                num_points=n_points)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"policy params: {n_params/1e6:.2f}M, cloud {n_points} pts")

    init_state, train_step = make_train_step(
        model, point_match_loss_weight=args.point_match_weight,
        collision_loss_weight=args.collision_weight,
        num_robot_points=args.robot_points, learning_rate=args.lr)
    state = init_state(params)
    step = jax.jit(train_step)

    # validation: the rollout fn is built (and jitted) ONCE, and runs on a
    # HELD-OUT batch from a separate rng stream — not the current training
    # batch, which would make avg_target_error an in-sample metric
    val_fn = None
    val_batch = None
    def make_batch(r):
        if batcher is not None:
            return {k: jnp.asarray(v)
                    for k, v in batcher.batch(args.batch).items()}
        return {k: jnp.asarray(v) for k, v in policy_batch(
            r, args.batch, num_robot_points=args.robot_points,
            num_obstacle_points=args.obstacle_points).items()}

    if args.validate_every:
        val_fn = make_validate_fn(model, rollout_length=args.rollout_length,
                                  num_robot_points=args.robot_points)
        if batcher is not None:
            from edmp_tpu.data.pointcloud import CorpusPolicyBatcher

            val_batcher = CorpusPolicyBatcher(
                args.corpus, num_robot_points=args.robot_points,
                num_obstacle_points=args.obstacle_points - args.target_points,
                num_target_points=args.target_points, seed=args.seed + 101)
            val_batch = {k: jnp.asarray(v)
                         for k, v in val_batcher.batch(args.batch).items()}
        else:
            val_rng = np.random.default_rng((args.seed, 0xA1))
            val_batch = {k: jnp.asarray(v) for k, v in policy_batch(
                val_rng, args.batch, num_robot_points=args.robot_points,
                num_obstacle_points=args.obstacle_points).items()}

    pool = None
    if args.batch_pool:
        t0 = time.time()
        pool = [make_batch(rng) for _ in range(args.batch_pool)]
        print(f"pool: {args.batch_pool} batches in {time.time() - t0:.0f}s",
              flush=True)

    t0 = time.time()
    window = []
    for i in range(args.steps):
        if pool is not None:
            batch = pool[i % len(pool)]
        else:
            batch = make_batch(rng)
        state, log = step(state, batch)
        window.append(float(log["val_loss"]))
        if (i + 1) % args.log_every == 0:
            rate = args.log_every * args.batch / (time.time() - t0)
            print(f"step {i+1:6d}  loss {np.mean(window):.5f}  "
                  f"{rate:,.1f} samples/s", flush=True)
            window.clear()
            t0 = time.time()
        if val_fn is not None and (i + 1) % args.validate_every == 0:
            metrics = val_fn(state.params, val_batch)
            print(f"  validate: target_err "
                  f"{float(metrics['avg_target_error']):.4f} m, "
                  f"collision_rate "
                  f"{float(metrics['avg_collision_rate']):.3f}", flush=True)

    if args.ckpt_dir:
        import os

        os.makedirs(args.ckpt_dir, exist_ok=True)
        out = os.path.join(args.ckpt_dir, "policy_params.npz")
        save_policy_params(state.params, out)
        print(f"done; params -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
