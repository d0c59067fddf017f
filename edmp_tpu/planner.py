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
from edmp_tpu.costs.grad_kernel import swept_cost_per_sample_fast
from edmp_tpu.costs.guide import GuideParams, ik_goal_volumes
from edmp_tpu.costs.obstacles import SceneObstacles
from edmp_tpu.diffusion.sampler import denoise_guided, denoise_guided_ddim
from edmp_tpu.diffusion.schedule import DiffusionSchedule


def _resolve_guidance_fn(engine: str):
    """Guidance-gradient engine slot: 'auto' (Pallas on TPU, lane-major XLA
    elsewhere — the measured-best per backend), 'manual' (hand-derived XLA,
    grad_kernel.py), 'pallas' (fused VMEM-resident kernel, pallas_grad.py),
    'fast' (jax.grad of the lane-major cost, fast_guide.py).

    Measured on v5e (bench_details.json, dataset-aware O=8 padding): pallas
    23.68 vs manual 22.56 scenes/s at S=17 — the VMEM-resident kernel wins
    once the obstacle volume term shrinks; at the old O=24 padding XLA won.
    """
    if engine == "auto":
        import jax

        engine = "pallas" if jax.default_backend() == "tpu" else "manual"
    if engine == "pallas":
        from edmp_tpu.costs.pallas_grad import guidance_gradient_pallas

        return guidance_gradient_pallas
    if engine == "fast":
        from edmp_tpu.costs.fast_guide import guidance_gradient_fast

        return guidance_gradient_fast
    if engine == "noop":
        # diagnostic: keeps the guided-pair scan structure and obstacle prep
        # but skips the gradient math — isolates the gradient's in-scan share
        return lambda joints, *a, **k: jnp.zeros_like(joints)
    # 'manual' -> None: the sampler's lane-resident default path
    # (sampler._make_lane_guided_update, same adjoint core as grad_kernel)
    return None


def _run_sampler(apply_fn, params, schedule, scene, guide, start, goal, rng,
                 cfg: "PlannerConfig", batch_size: int):
    gfn = _resolve_guidance_fn(cfg.guidance_engine)
    if cfg.sampler == "ddim":
        return denoise_guided_ddim(
            apply_fn, params, schedule, scene, guide, start, goal, rng,
            batch_size=batch_size, num_steps=cfg.ddim_steps,
            traj_len=cfg.traj_len, num_channels=cfg.num_channels,
            guidance_fn=gfn, guidance_period=cfg.ddim_guidance_period)
    return denoise_guided(
        apply_fn, params, schedule, scene, guide, start, goal, rng,
        batch_size=batch_size, traj_len=cfg.traj_len,
        num_channels=cfg.num_channels,
        guidance_period=cfg.guidance_period,
        guidance_min_t=cfg.guidance_min_t,
        guidance_fn=gfn)


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
    # sampler: 'ddpm' = reference-parity full-T reverse process;
    # 'ddim' = accelerated deterministic subsequence sampling
    sampler: str = "ddpm"
    ddim_steps: int = 32
    # guidance cadence for DDIM (every k-th coarse step; docs/ddim_cadence.md)
    ddim_guidance_period: int = 1
    # gradient engine: 'auto' = Pallas kernel on TPU / lane-major XLA on
    # CPU (measured-best per backend), or force 'manual'/'pallas'/'fast'
    guidance_engine: str = "auto"
    # safety extensions beyond the reference (docs/assist_study.md).
    # sc_filter_goals: drop self-colliding IK goal candidates BEFORE the
    # trust-region argmin — the round-4 failure analysis found 37/63
    # self-collision failures were baked into the selected goal itself,
    # unfixable by any trajectory steering (the reference's IK sweep has the
    # same blind spot, datasets/load_test_dataset.py:176-187).
    sc_filter_goals: bool = False
    # safety_aware_selection: add self-collision/joint-limit penalties to
    # the best-of-batch metric so any clean sample beats every dirty one
    # (costs/assist.trajectory_safety_penalties).
    safety_aware_selection: bool = False


class PlanResult(NamedTuple):
    best: jnp.ndarray          # (N, 7) selected trajectory
    best_index: jnp.ndarray    # () int
    trajectories: jnp.ndarray  # (B, N, 7) full batch
    goal: jnp.ndarray          # (7,) selected goal configuration
    swept_costs: jnp.ndarray   # (B,) RAW swept volume per sample
    # safety-aware selection extras: the selection metric is
    # swept_costs + penalties (zeros when safety_aware_selection is off),
    # and violation_mask carries per-sample VIOLATION_* class bits — the
    # raw cost and the penalty are spooled SEPARATELY so safe/unsafe runs
    # stay cost-comparable
    penalties: jnp.ndarray      # (B,)
    violation_mask: jnp.ndarray  # (B,) int32


def select_goal(ik_goals, ik_valid, start, scene: SceneObstacles,
                trust_region: float, sc_filter: bool = False):
    """Trust-region goal filter (infer_serial.py:117-129).

    Among IK candidates whose t=0 intersection volume is within
    ``trust_region`` of the minimum, pick the one closest to the start
    configuration.  Invalid (padded) candidates are masked out.

    ``sc_filter`` (beyond the reference): additionally reject candidates
    whose capsule model self-collides — a goal configuration in
    self-collision dooms the whole plan under the strict protocol, since
    endpoints are re-pinned every step.  Falls back to the unfiltered set
    when EVERY candidate self-collides (better a dirty goal than a padded
    garbage one).
    """
    vols = ik_goal_volumes(ik_goals, scene)
    inf = jnp.asarray(jnp.inf, vols.dtype)
    if sc_filter:
        from edmp_tpu.costs.assist import min_clearance_per_config

        sc_ok = min_clearance_per_config(ik_goals) > 0.0
        keep = ik_valid & sc_ok
        ik_valid = jnp.where(jnp.any(keep), keep, ik_valid)
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
                       cfg.volume_trust_region, cfg.sc_filter_goals)

    trajs = _run_sampler(apply_fn, params, schedule, scene, guide, start,
                         goal, rng, cfg, cfg.batch_size)

    # lane-major selection metric: same swept volume, ~40x cheaper layout
    # (docs/ddim_mfu.md out-of-scan finding)
    costs = swept_cost_per_sample_fast(trajs, scene)
    pen, mask = _selection_penalties(trajs, costs, cfg)
    best_idx = jnp.argmin(costs + pen)
    return PlanResult(
        best=trajs[best_idx],
        best_index=best_idx,
        trajectories=trajs,
        goal=goal,
        swept_costs=costs,
        penalties=pen,
        violation_mask=mask,
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


def _selection_penalties(trajs, costs, cfg: "PlannerConfig"):
    """(penalties, violation_mask) for best-of-batch selection — zeros when
    safety-aware selection is off (and XLA dead-code-eliminates the
    additions)."""
    if cfg.safety_aware_selection:
        from edmp_tpu.costs.assist import safety_penalty_terms

        return safety_penalty_terms(trajs, costs)
    return jnp.zeros_like(costs), jnp.zeros(costs.shape, jnp.int32)


class ScenesPlanResult(NamedTuple):
    best: jnp.ndarray          # (S, N, 7)
    best_index: jnp.ndarray    # (S,)
    trajectories: jnp.ndarray  # (S, B, N, 7)
    goal: jnp.ndarray          # (S, 7)
    swept_costs: jnp.ndarray   # (S, B) RAW swept volume per sample
    penalties: jnp.ndarray     # (S, B) selection penalties (see PlanResult)
    violation_mask: jnp.ndarray  # (S, B) int32 VIOLATION_* class bits


def plan_scenes(
    apply_fn: Callable,
    params,
    schedule: DiffusionSchedule,
    scenes: SceneObstacles,   # stacked, leading S axis
    guide: GuideParams,       # (B, ...) one ensemble, shared across scenes
    starts: jnp.ndarray,      # (S, 7)
    ik_goals: jnp.ndarray,    # (S, K, 7)
    ik_valid: jnp.ndarray,    # (S, K)
    rng: jax.Array,
    cfg: PlannerConfig,
) -> ScenesPlanResult:
    """Scene-folded multi-scene planning: ONE fused device program.

    Scenes are folded into the batch axis (S*B samples) instead of vmapping
    the whole planner per scene — same math, one compile, and the batch is
    large enough to feed the MXU.  Per-sample obstacle arrays make each
    trajectory see its own scene; the ensemble hyperparameters tile across
    scenes.
    """
    from edmp_tpu.costs.obstacles import tile_scene_per_sample

    S = starts.shape[0]
    B = cfg.batch_size
    starts = jnp.asarray(starts, jnp.float32)

    import functools

    goals = jax.vmap(
        functools.partial(select_goal, sc_filter=cfg.sc_filter_goals),
        in_axes=(0, 0, 0, 0, None))(
        ik_goals, ik_valid, starts, scenes, cfg.volume_trust_region)

    sample_scene = tile_scene_per_sample(scenes, B)

    def _tile_w(w):  # assist weights: (B,) arrays tile, None passes through
        return None if w is None else jnp.tile(w, S)

    guide_folded = GuideParams(
        clearance=jnp.tile(guide.clearance, (S, 1)),
        expansion=jnp.tile(guide.expansion, (S, 1)),
        guidance_method=jnp.tile(guide.guidance_method, S),
        grad_norm=jnp.tile(guide.grad_norm, S),
        guidance_schedule=jnp.tile(guide.guidance_schedule, (S, 1)),
        self_collision_weight=_tile_w(guide.self_collision_weight),
        joint_limit_weight=_tile_w(guide.joint_limit_weight),
        env_clearance_weight=_tile_w(guide.env_clearance_weight),
    )
    start_s = jnp.repeat(starts, B, axis=0)
    goal_s = jnp.repeat(goals, B, axis=0)

    trajs = _run_sampler(apply_fn, params, schedule, sample_scene,
                         guide_folded, start_s, goal_s, rng, cfg, S * B)

    costs = swept_cost_per_sample_fast(trajs, sample_scene)
    pen, mask = _selection_penalties(trajs, costs, cfg)
    costs = costs.reshape(S, B)
    pen = pen.reshape(S, B)
    mask = mask.reshape(S, B)
    best_idx = jnp.argmin(costs + pen, axis=1)
    trajs = trajs.reshape(S, B, cfg.traj_len, cfg.num_channels)
    best = jnp.take_along_axis(
        trajs, best_idx[:, None, None, None], axis=1)[:, 0]
    return ScenesPlanResult(best=best, best_index=best_idx,
                            trajectories=trajs, goal=goals,
                            swept_costs=costs, penalties=pen,
                            violation_mask=mask)


def make_batched_plan_fn(model, schedule: DiffusionSchedule,
                         cfg: PlannerConfig, jit: bool = True, mesh=None):
    """Scene-folded multi-scene plan callable (see plan_scenes).

    With ``mesh``, the leading scene axis of every per-scene input/output is
    sharded over the mesh's 'scenes' axis and params/guide replicate — the
    production multi-chip path (scenes must be padded to a multiple of the
    mesh size by the caller; run_sweep does).  The program is pure data
    parallel, so XLA partitions it with no cross-chip traffic on the hot loop.
    """

    def apply_fn(params, x, t):
        return model.apply({"params": params}, x, t)

    def fn(params, scenes, guide, starts, ik_goals, ik_valid, rng):
        return plan_scenes(apply_fn, params, schedule, scenes, guide, starts,
                           ik_goals, ik_valid, rng, cfg)

    if mesh is not None:
        from edmp_tpu.parallel.mesh import replicated, scene_sharding

        rep, sc = replicated(mesh), scene_sharding(mesh)
        return jax.jit(
            fn,
            in_shardings=(rep, sc, rep, sc, sc, sc, rep),
            out_shardings=sc)
    return jax.jit(fn) if jit else fn


def make_large_batch_plan_fn(model, schedule: DiffusionSchedule,
                             cfg: PlannerConfig, mesh):
    """Single scene x huge sample batch, sharded over the mesh (the BASELINE
    '1 scene, 1000+ trajectories' configuration).

    The sample batch (guide ensemble x samples) shards on the mesh axis; the
    final best-of-batch selection is an explicit cross-shard argmin-reduce
    (parallel/collectives.py) — the multi-chip form of lib/guide.py:648.
    ``cfg.batch_size`` must be a multiple of the mesh size.
    """
    from edmp_tpu.parallel.collectives import make_global_best
    from edmp_tpu.parallel.mesh import replicated, scene_sharding

    rep, sh = replicated(mesh), scene_sharding(mesh)

    def apply_fn(params, x, t):
        return model.apply({"params": params}, x, t)

    def sample_fn(params, scene, guide, start, ik_goals, ik_valid, rng):
        start = jnp.asarray(start, jnp.float32)
        goal = select_goal(ik_goals, ik_valid, start, scene,
                           cfg.volume_trust_region, cfg.sc_filter_goals)
        trajs = _run_sampler(apply_fn, params, schedule, scene, guide, start,
                             goal, rng, cfg, cfg.batch_size)
        costs = swept_cost_per_sample_fast(trajs, scene)
        pen, _ = _selection_penalties(trajs, costs, cfg)
        return trajs, costs + pen, goal

    # batch axis sharded for per-sample arrays (guide hyperparameters and the
    # produced trajectories); scene/start/goals replicate
    sampler = jax.jit(
        sample_fn,
        in_shardings=(rep, rep, sh, rep, rep, rep, rep),
        out_shardings=(sh, sh, rep))
    best_fn = make_global_best(mesh)

    def fn(params, scene, guide, start, ik_goals, ik_valid, rng):
        trajs, costs, goal = sampler(params, scene, guide, start, ik_goals,
                                     ik_valid, rng)
        best_cost, best_traj = best_fn(costs, trajs)
        return best_traj, best_cost, goal, costs

    return fn
