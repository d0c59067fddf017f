"""End-to-end single-scene planner: one pure, jittable function.

Pipeline (mirrors infer_serial.py:95-170, fused on-device):
  IK-goal trust-region filter  ->  guided reverse diffusion (255-step scan)
  ->  swept-volume best-of-batch selection.

``plan`` is shaped for ``jax.vmap`` over scenes (every input is a fixed-shape
array or pytree), which is how the sweep driver batches S scenes per chip and
how the multi-chip runtime shards scenes across a mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from edmp_tpu import constants as C
from edmp_tpu.costs.guide import (GuideParams, ik_goal_volumes,
                                  swept_cost_per_sample)
from edmp_tpu.costs.obstacles import SceneObstacles
from edmp_tpu.diffusion.sampler import denoise_guided
from edmp_tpu.diffusion.schedule import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class PlannerConfig:
    batch_size: int
    traj_len: int = C.DEFAULT_TRAJ_LEN
    num_channels: int = C.DEFAULT_NUM_CHANNELS
    guidance_period: int = 2
    guidance_min_t: int = 5
    # The driver overrides every guide's trust region with this constant
    # (infer_serial.py:125).
    volume_trust_region: float = 8.0e-4


class PlanResult(NamedTuple):
    best: jnp.ndarray          # (N, 7) selected trajectory
    best_index: jnp.ndarray    # () int
    trajectories: jnp.ndarray  # (B, N, 7) full batch
    goal: jnp.ndarray          # (7,) selected goal configuration
    swept_costs: jnp.ndarray   # (B,) selection metric per sample


def select_goal(ik_goals, ik_valid, start, scene: SceneObstacles,
                trust_region: float):
    """Trust-region goal filter (infer_serial.py:117-129).

    Among IK candidates whose t=0 intersection volume is within
    ``trust_region`` of the minimum, pick the one closest to the start
    configuration.  Invalid (padded) candidates are masked out.
    """
    vols = ik_goal_volumes(ik_goals, scene)
    inf = jnp.asarray(jnp.inf, vols.dtype)
    vols = jnp.where(ik_valid, vols, inf)
    eligible = vols < jnp.min(vols) + trust_region
    dist = jnp.linalg.norm(start[None, :] - ik_goals, axis=-1)
    dist = jnp.where(eligible, dist, jnp.inf)
    return ik_goals[jnp.argmin(dist)]


def plan(
    apply_fn: Callable,
    params,
    schedule: DiffusionSchedule,
    scene: SceneObstacles,
    guide: GuideParams,
    start: jnp.ndarray,
    ik_goals: jnp.ndarray,
    ik_valid: jnp.ndarray,
    rng: jax.Array,
    cfg: PlannerConfig,
) -> PlanResult:
    """Plan one scene.  All-device, no host round trips.

    ik_goals : (K, 7) padded IK candidates, ik_valid : (K,) bool mask.
    """
    start = jnp.asarray(start, jnp.float32)
    goal = select_goal(ik_goals, ik_valid, start, scene,
                       cfg.volume_trust_region)

    trajs = denoise_guided(
        apply_fn, params, schedule, scene, guide, start, goal, rng,
        batch_size=cfg.batch_size, traj_len=cfg.traj_len,
        num_channels=cfg.num_channels,
        guidance_period=cfg.guidance_period,
        guidance_min_t=cfg.guidance_min_t,
    )

    costs = swept_cost_per_sample(trajs[:, 1:-1, :], start, goal, scene)
    best_idx = jnp.argmin(costs)
    return PlanResult(
        best=trajs[best_idx],
        best_index=best_idx,
        trajectories=trajs,
        goal=goal,
        swept_costs=costs,
    )


def make_plan_fn(model, schedule: DiffusionSchedule, cfg: PlannerConfig,
                 jit: bool = True):
    """Bind a Flax model into a (params, scene, guide, start, goals, valid,
    rng) -> PlanResult callable; optionally jitted."""

    def apply_fn(params, x, t):
        return model.apply({"params": params}, x, t)

    def fn(params, scene, guide, start, ik_goals, ik_valid, rng):
        return plan(apply_fn, params, schedule, scene, guide, start,
                    ik_goals, ik_valid, rng, cfg)

    return jax.jit(fn) if jit else fn


def make_batched_plan_fn(model, schedule: DiffusionSchedule,
                         cfg: PlannerConfig, jit: bool = True):
    """vmap over scenes: scene pytree/start/goals/valid/rng gain a leading
    S axis; params and guide are broadcast."""

    def apply_fn(params, x, t):
        return model.apply({"params": params}, x, t)

    def one(params, scene, guide, start, ik_goals, ik_valid, rng):
        return plan(apply_fn, params, schedule, scene, guide, start,
                    ik_goals, ik_valid, rng, cfg)

    batched = jax.vmap(one, in_axes=(None, 0, None, 0, 0, 0, 0))
    return jax.jit(batched) if jit else batched
