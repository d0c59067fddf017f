"""Training CLI — the runnable counterpart of the reference's (broken)
``training.py`` recipe: unconditional epsilon-prediction, MSE, Adam 1e-4,
batch 2048, T=256 (training.py:19-32).

Data: MPiNets ``train.hdf5`` ({global,hybrid}_solutions) or ``--synthetic``
smooth trajectories for smoke runs.  Checkpointing: orbax (full train state)
+ losses.npy, resumable with --resume.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="edmp-train")
    ap.add_argument("--data", default=None, help="path to train.hdf5")
    ap.add_argument("--data-npz", default=None,
                    help="npz trajectory corpus dir/file (tools/distill.py "
                    "shards: trajectories (M, N, 7))")
    ap.add_argument("--smooth-mix", type=float, default=0.0,
                    help="fraction of each --data-npz batch drawn from the "
                    "smoothstep generator (regularizer)")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--steps", type=int, default=50000)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--T", type=int, default=256)
    ap.add_argument("--traj-len", type=int, default=50)
    ap.add_argument("--dims", type=int, nargs="*",
                    default=[32, 64, 128, 256, 512, 512])
    ap.add_argument("--time-dim", type=int, default=32)
    ap.add_argument("--ema", type=float, default=0.0)
    ap.add_argument("--ckpt-dir", default="./models/edmp_tpu_ckpt")
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--wandb-project", default=None)
    ap.add_argument("--run-name", default="edmp-train")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from edmp_tpu.data.synthetic import smooth_trajectories
    from edmp_tpu.diffusion.schedule import make_schedule
    from edmp_tpu.diffusion.training import (TrainConfig, init_state,
                                             make_sharded_train_step)
    from edmp_tpu.models import temporal_unet as tu
    from edmp_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from edmp_tpu.utils.checkpoint import TrainCheckpointer

    rng = np.random.default_rng(args.seed)
    if args.data:
        from edmp_tpu.data.hdf5 import TrajectoryDataset

        ds = TrajectoryDataset(args.data)
        batches = ds.batches(args.batch, rng)
        print(f"training on {ds.num_trajectories} trajectories "
              f"({ds.key}), horizon {ds.traj_len}")
    elif args.data_npz:
        import glob

        paths = (sorted(glob.glob(os.path.join(args.data_npz, "trajs_*.npz")))
                 if os.path.isdir(args.data_npz) else [args.data_npz])
        corpus = np.concatenate(
            [np.load(p)["trajectories"] for p in paths]).astype(np.float32)
        n_smooth = int(args.batch * args.smooth_mix)
        print(f"training on {len(corpus)} distilled trajectories "
              f"({len(paths)} shard(s)), smooth-mix {n_smooth}/{args.batch}")

        def corpus_batches():
            while True:
                idx = rng.integers(0, len(corpus), args.batch - n_smooth)
                batch = corpus[idx]
                if n_smooth:
                    batch = np.concatenate(
                        [batch,
                         smooth_trajectories(rng, n_smooth, args.traj_len)])
                yield batch
        batches = corpus_batches()
    elif args.synthetic:
        def synthetic_batches():
            while True:
                yield smooth_trajectories(rng, args.batch, args.traj_len)
        batches = synthetic_batches()
    else:
        print("[error] pass --data train.hdf5 or --synthetic",
              file=sys.stderr)
        return 2

    model = tu.create_model(time_dim=args.time_dim, dims=tuple(args.dims))
    cfg = TrainConfig(learning_rate=args.lr, batch_size=args.batch,
                      ema_decay=args.ema)
    schedule = make_schedule(args.T)
    mesh = make_mesh(axis=DATA_AXIS)
    state = init_state(model, jax.random.key(args.seed), cfg,
                       traj_len=args.traj_len, host_init=True)
    print(f"model params: {tu.param_count(state.params)/1e6:.2f}M, "
          f"mesh: {mesh.devices.size} device(s)")

    ckpt = TrainCheckpointer(args.ckpt_dir, save_interval_steps=args.ckpt_every)
    start_step = 0
    if args.resume:
        restored = ckpt.restore(jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state))
        if restored is not None:
            state = restored
            start_step = int(state.step)
            print(f"resumed from step {start_step}")

    step_fn = make_sharded_train_step(model, schedule, cfg, mesh)
    key = jax.random.key(args.seed + 1)

    from edmp_tpu.utils.logging import MetricLogger

    logger = MetricLogger(args.ckpt_dir, run_name=args.run_name,
                          wandb_project=args.wandb_project,
                          config=vars(args))

    t0 = time.time()
    window = []
    with mesh:
        for step in range(start_step, args.steps):
            x0 = jnp.asarray(next(batches))
            key, sub = jax.random.split(key)
            state, loss = step_fn(state, x0, sub)
            window.append(float(loss))
            if (step + 1) % args.log_every == 0:
                rate = args.log_every * args.batch / (time.time() - t0)
                print(f"step {step+1:7d}  loss {np.mean(window):.5f}  "
                      f"{rate:,.0f} traj/s", flush=True)
                logger.log(step + 1, loss=float(np.mean(window)),
                           traj_per_sec=rate)
                window.clear()
                t0 = time.time()
            ckpt.note_loss(float(loss))
            if (step + 1) % args.ckpt_every == 0 or step + 1 == args.steps:
                ckpt.save(step + 1, jax.device_get(state))
    ckpt.wait()

    # torch-free inference artifact for cli.infer --weights-npz
    from edmp_tpu.utils.checkpoint import export_inference_weights

    out = f"{args.ckpt_dir}/weights_inference.npz"
    export_inference_weights(
        state.ema_params if state.ema_params is not None else state.params,
        out)
    print(f"done; inference weights -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
