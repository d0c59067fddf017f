"""Isolate the DDIM per-step inefficiency (docs/ddim_mfu.md follow-up).

Measured: at identical batch (S=21 x 120 = 2520) a DDIM-16 no-guidance
UNet step costs ~295 us vs the DDPM-255 no-guidance step's ~156 us — the
fast mode's MFU gap is PER-STEP, not per-call amortization (fold scaling
is flat).  This probe times minimal standalone scans to attribute it:

  raw16   : lax.scan of 16 bare UNet applications
  raw255  : lax.scan of 255 bare UNet applications
  ddpm16  : 16-step scan of the DDPM posterior update (incl. per-step
            normal noise)
  ddim16  : 16-step scan of the DDIM x0-recombination update (no noise)

raw16 vs raw255 per-step separates scan-length effects (per-call constant
work amortization) from step math; ddim16 vs ddpm16 separates the two
samplers' update algebra.

Run (TPU): python -m tools.ddim_step_probe
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
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="ddim_step_probe")
    ap.add_argument("--batch", type=int, default=2520)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from edmp_tpu.diffusion.schedule import make_schedule
    from edmp_tpu.models import temporal_unet as tu

    N, C = 50, 7
    model = tu.create_model()
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, N, C)), jnp.ones(1)),
        jax.random.key(0))["params"]
    host = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(host.normal(0, 0.02, s.shape), s.dtype),
        shapes)
    sch = make_schedule(255)
    x0 = jnp.asarray(host.normal(0, 1, (args.batch, N, C)), jnp.float32)

    def apply_fn(p, x, t):
        return model.apply({"params": p}, x, t)

    def make_raw(K):
        def step(x, k):
            t = (255 - k).astype(jnp.float32)
            return apply_fn(params, x, t[None]), ()

        return jax.jit(lambda x: jax.lax.scan(step, x, jnp.arange(K))[0])

    def make_ddpm(K):
        key = jax.random.key(1)

        def step(x, k):
            t = 255 - k
            eps = apply_fn(params, x, t.astype(jnp.float32)[None])
            a = sch.alpha[t - 1]
            ab = sch.alpha_bar[t - 1]
            b = sch.beta[t - 1]
            z = jax.random.normal(jax.random.fold_in(key, t), x.shape)
            x = (x - ((1 - a) / jnp.sqrt(1 - ab)) * eps) / jnp.sqrt(a)
            return x + b * z, ()

        return jax.jit(lambda x: jax.lax.scan(step, x, jnp.arange(K))[0])

    def make_ddim(K):
        taus = jnp.asarray(
            np.unique(np.round(np.linspace(255, 1, K)))[::-1].copy()
        ).astype(jnp.int32)
        KK = taus.shape[0]

        def step(x, k):
            t = taus[k]
            t_next = jnp.where(k + 1 < KK, taus[jnp.minimum(k + 1, KK - 1)],
                               0)
            eps = apply_fn(params, x, t.astype(jnp.float32)[None])
            ab_t = sch.alpha_bar[t - 1]
            ab_n = jnp.where(t_next >= 1, sch.alpha_bar[t_next - 1], 1.0)
            xx = (x - jnp.sqrt(1.0 - ab_t) * eps) / jnp.sqrt(ab_t)
            return jnp.sqrt(ab_n) * xx + jnp.sqrt(1.0 - ab_n) * eps, ()

        return jax.jit(lambda x: jax.lax.scan(step, x, jnp.arange(KK))[0])

    def time_fn(fn, K, label):
        y = fn(x0)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            y = fn(x0)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / args.reps
        us = 1e6 * dt / K
        print(json.dumps({"probe": label, "steps": K,
                          "call_ms": round(1e3 * dt, 3),
                          "us_per_step": round(us, 2)}), flush=True)
        return us

    def make_ddim_pinned(K):
        """The PLANNER's actual per-step extras: endpoint pinning after
        every step (diffusion.py:347-349 parity)."""
        taus = jnp.asarray(
            np.unique(np.round(np.linspace(255, 1, K)))[::-1].copy()
        ).astype(jnp.int32)
        KK = taus.shape[0]
        start = jnp.zeros(7, jnp.float32)
        goal = jnp.ones(7, jnp.float32) * 0.3

        def step(x, k):
            t = taus[k]
            t_next = jnp.where(k + 1 < KK, taus[jnp.minimum(k + 1, KK - 1)],
                               0)
            eps = apply_fn(params, x, t.astype(jnp.float32)[None])
            ab_t = sch.alpha_bar[t - 1]
            ab_n = jnp.where(t_next >= 1, sch.alpha_bar[t_next - 1], 1.0)
            xx = (x - jnp.sqrt(1.0 - ab_t) * eps) / jnp.sqrt(ab_t)
            x = jnp.sqrt(ab_n) * xx + jnp.sqrt(1.0 - ab_n) * eps
            x = x.at[:, 0, :].set(start)
            x = x.at[:, -1, :].set(goal)
            return x, ()

        return jax.jit(lambda x: jax.lax.scan(step, x, jnp.arange(KK))[0])

    r16 = time_fn(make_raw(16), 16, "raw16")
    r255 = time_fn(make_raw(255), 255, "raw255")
    d16 = time_fn(make_ddpm(16), 16, "ddpm16")
    i16 = time_fn(make_ddim(16), 16, "ddim16")
    i255 = time_fn(make_ddim(255), 255, "ddim255")
    d255 = time_fn(make_ddpm(255), 255, "ddpm255")
    p16 = time_fn(make_ddim_pinned(16), 16, "ddim16_pinned")
    print(json.dumps({"pinning_effect_us_per_step": round(p16 - i16, 2)}))
    print(json.dumps({
        "scan_length_effect_us": round(r16 - r255, 2),
        "ddim_math_vs_ddpm_math_16_us": round(i16 - d16, 2),
        "ddim_math_vs_ddpm_math_255_us": round(i255 - d255, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
