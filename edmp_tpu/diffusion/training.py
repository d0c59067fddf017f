"""Unconditional epsilon-prediction training for the Temporal UNet.

Recipe parity (training.py:19-92 in the reference): MSE on predicted noise,
Adam lr=1e-4, batch 2048, endpoint-conditioned q-samples, T=256.  Re-designed
for TPU: the whole step (q-sample + forward + backward + update) is one jitted
function, data-parallel over a ``jax.sharding.Mesh`` with replicated params —
at ~15M params this model replicates; TP/PP are a deliberate descope
(SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from edmp_tpu.diffusion.sampler import generate_q_sample
from edmp_tpu.diffusion.schedule import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    batch_size: int = 2048
    ema_decay: float = 0.0  # 0 disables EMA (reference has none)


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: dict
    opt_state: optax.OptState
    ema_params: dict | None


def make_optimizer(cfg: TrainConfig):
    return optax.adam(cfg.learning_rate)


def init_state(model, rng, cfg: TrainConfig, traj_len: int = 50,
               host_init: bool = False) -> TrainState:
    from edmp_tpu.models.temporal_unet import host_init_params, init_params

    if host_init:
        # numpy-side init (no device compile) — statistically equivalent;
        # essential on tunneled backends where model.init costs minutes
        params = host_init_params(model, traj_len=traj_len)
    else:
        params = init_params(rng, model, traj_len=traj_len)
    opt_state = make_optimizer(cfg).init(params)
    ema = jax.tree.map(jnp.copy, params) if cfg.ema_decay > 0 else None
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state, ema)


def make_train_step(model, schedule: DiffusionSchedule, cfg: TrainConfig):
    """Returns step(state, x0, rng) -> (state, loss).  x0: (B, N, 7)."""
    opt = make_optimizer(cfg)

    def loss_fn(params, x0, rng):
        xt, eps, t = generate_q_sample(schedule, x0, rng)
        pred = model.apply({"params": params}, xt, t.astype(jnp.float32))
        return jnp.mean((pred - eps) ** 2)

    def step(state: TrainState, x0, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, x0, rng)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = cfg.ema_decay
            ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema, params)
        return TrainState(state.step + 1, params, opt_state, ema), loss

    return step


def make_sharded_train_step(model, schedule: DiffusionSchedule,
                            cfg: TrainConfig, mesh):
    """Data-parallel train step over ``mesh`` (axis name 'data').

    Params/opt-state replicated, batch sharded on 'data'; gradients are
    reduced by XLA's collectives (psum over ICI) inside the jitted step.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    step = make_train_step(model, schedule, cfg)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    return jax.jit(
        step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
