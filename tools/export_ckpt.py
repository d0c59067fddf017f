"""Export inference weights from an orbax training checkpoint.

The training CLI exports ``weights_inference.npz`` only when its step loop
completes; a truncated run leaves orbax checkpoints (saved every
``--ckpt-every``) but no inference artifact.  This tool restores the latest
(or a given) step and writes the same npz the CLI would have
(EMA params when the run tracked them, raw params otherwise).

Run (CPU is fine): python -m tools.export_ckpt --ckpt-dir models/distilled_v4
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="export_ckpt")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    ap.add_argument("--out", default=None,
                    help="output npz (default: <ckpt-dir>/weights_inference.npz)")
    ap.add_argument("--ema", dest="ema", type=float, default=0.999,
                    help="ema_decay the run was trained with (shapes the "
                    "state template; use 0 for a run without EMA)")
    args = ap.parse_args(argv)

    import jax

    from edmp_tpu.diffusion.training import TrainConfig, init_state
    from edmp_tpu.models import temporal_unet as tu
    from edmp_tpu.utils.checkpoint import (TrainCheckpointer,
                                           export_inference_weights)

    model = tu.create_model()
    cfg = TrainConfig(ema_decay=args.ema)
    state = init_state(model, jax.random.key(0), cfg, traj_len=50,
                       host_init=True)
    ckpt = TrainCheckpointer(args.ckpt_dir)
    restored = ckpt.restore(jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state),
        step=args.step)
    if restored is None:
        print(f"[error] no checkpoint under {args.ckpt_dir}", file=sys.stderr)
        return 2
    params = (restored.ema_params if restored.ema_params is not None
              else restored.params)
    out = args.out or os.path.join(args.ckpt_dir, "weights_inference.npz")
    export_inference_weights(params, out)
    print(f"step {int(restored.step)} -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
