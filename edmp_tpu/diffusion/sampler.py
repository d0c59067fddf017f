"""Guided reverse-DDPM sampling as a single fused ``lax.scan``.

The reference's hot loop (``diffusion/diffusion.py:300-356``) runs 255 Python
iterations per scene, bouncing tensors host<->device every step.  Here the
entire reverse process — UNet epsilon, posterior step, cadence-gated ensemble
guidance, endpoint re-pinning — is one scan compiled by XLA; guidance steps
are a ``lax.cond`` branch so odd timesteps skip the FK+cost gradient entirely.

Reproduced reference quirks (each is load-bearing for success-rate parity,
see SURVEY.md §7 risk register):
  * reverse update adds ``beta_t * z`` noise (diffusion.py:133), z = 0 at t=1;
  * guidance applies on even t with t >= 5, i.e. t in {6, 8, ..., 254}
    (diffusion.py:326-327);
  * the guide sees joint-limit-clipped interior waypoints, but the clip is
    NOT written back to the state (diffusion.py:328-341);
  * per-sample guidance scale indexed at t-1 (diffusion.py:341);
  * endpoints re-pinned to start/goal after every step (diffusion.py:347-349).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from edmp_tpu import constants as C
from edmp_tpu.costs.grad_kernel import (lane_major_guidance_grad,
                                        lane_major_obstacle_planes,
                                        scene_to_lane_major)
from edmp_tpu.costs.guide import GuideParams
from edmp_tpu.costs.obstacles import SceneObstacles, obstacle_aabbs
from edmp_tpu.diffusion.schedule import DiffusionSchedule

# numpy (not device) constants — device-array creation at import would
# initialize the backend before jax.distributed.initialize
_LOWER = np.asarray(C.JOINT_LIMITS_LOWER, np.float32)
_UPPER = np.asarray(C.JOINT_LIMITS_UPPER, np.float32)


def _make_lane_guided_update(scene, guide, start, goal, batch_size,
                             expansion_t, clearance_t, schedule_t):
    """Build the LANE-RESIDENT guided step (the default engine's fast path).

    In-scan profiling (bench_details.json r3: no-guidance 25.2 vs noop 24.6
    vs manual 21.0 scenes/s) showed the gradient dataflow costs ~9x its
    standalone time inside the big scan body — fusion/layout churn, not
    math.  This path hoists every t-independent piece out of the scan
    (obstacle-parameter transposes, blend weights, broadcast endpoints) so
    the per-step work is exactly: one transpose in, (O,B)-plane arithmetic,
    the adjoint core, one transpose out.
    """
    startb = jnp.broadcast_to(start, (batch_size, 7)).astype(jnp.float32)
    goalb = jnp.broadcast_to(goal, (batch_size, 7)).astype(jnp.float32)
    centersT, absrotT, dimsT = scene_to_lane_major(scene)
    m = guide.guidance_method
    w_iv = (1.0 - m)[None, :]
    w_sv = m[None, :]
    gn = guide.grad_norm  # (B,)

    def guided_update(x, t):
        interior = clip_joints(x[:, 1:-1, :])
        olo, ohi = lane_major_obstacle_planes(
            centersT, absrotT, dimsT, expansion_t[t - 1], clearance_t[t - 1])
        traj = jnp.concatenate(
            [startb[:, None, :], interior, goalb[:, None, :]], axis=1)
        qT = jnp.transpose(traj, (2, 1, 0))          # (7, W, B)
        gq = lane_major_guidance_grad(
            [qT[j] for j in range(7)], olo, ohi, w_iv, w_sv)
        gq = [g[1:-1] for g in gq]                   # interior rows, (N, B)
        # whole-tensor grad-norm blend (lib/guide.py:627-629), same float-op
        # order as the reference-parity engine: (1-gn)*g + gn*(g/norm)
        # zero-gradient guard: ||g|| = 0 (scene never touched) must not
        # NaN-poison the whole batch via 0 * (g/0)
        norm = jnp.maximum(jnp.sqrt(sum(jnp.sum(g * g) for g in gq)), 1e-30)
        scale = schedule_t[t - 1][None, :]
        gn_r = gn[None, :]
        g = jnp.stack([scale * ((1.0 - gn_r) * g + gn_r * (g / norm))
                       for g in gq])                 # (7, N, B)
        return x.at[:, 1:-1, :].add(-jnp.transpose(g, (2, 1, 0)))

    return guided_update


def clip_joints(joints):
    """Clip to the sampler's joint limits (diffusion/diffusion.py:280-298)."""
    return jnp.clip(joints, _LOWER, _UPPER)


def _with_assist(guided_update, guide, scene=None):
    """Chain the self-collision/joint-limit assist update (costs/assist.py)
    and the exact-SDF env-clearance update (costs/clearance.py) onto a
    guided step.  Ensembles with every assist weight None return the
    original function — the compiled program is unchanged."""
    from edmp_tpu.costs.assist import make_assist_update
    from edmp_tpu.costs.clearance import make_clearance_update

    assist = make_assist_update(guide)
    clear = (make_clearance_update(guide, scene)
             if scene is not None else None)
    if assist is None and clear is None:
        return guided_update

    def update(x, t):
        x = guided_update(x, t)
        if assist is not None:
            x = assist(x)
        if clear is not None:
            x = clear(x)
        return x

    return update


def _pin_endpoints(x, start, goal):
    x = x.at[:, 0, :].set(start)
    x = x.at[:, -1, :].set(goal)
    return x


def denoise_guided(
    apply_fn: Callable,
    params,
    schedule: DiffusionSchedule,
    scene: SceneObstacles,
    guide: GuideParams,
    start: jnp.ndarray,
    goal: jnp.ndarray,
    rng: jax.Array,
    *,
    batch_size: int,
    traj_len: int = C.DEFAULT_TRAJ_LEN,
    num_channels: int = C.DEFAULT_NUM_CHANNELS,
    guidance_period: int = 2,
    guidance_min_t: int = 5,
    init_noise=None,
    step_noise=None,
    guidance_fn=None,
):
    """Run the full guided reverse process.  Returns (B, N, C) trajectories.

    apply_fn(params, x, t) -> epsilon with x (B, N, C) and t a (1,) float.

    ``init_noise`` (B, N, C) and ``step_noise`` (T, B, N, C) optionally inject
    the exact noise draws (x_T and the per-step posterior z, indexed
    ``step_noise[t-1]``) so a reference execution trace can be reproduced
    head-to-head (tests/test_reference_parity.py); production paths leave them
    None and draw from ``rng``.
    """
    T = schedule.T
    start = jnp.asarray(start, jnp.float32)
    goal = jnp.asarray(goal, jnp.float32)

    init_key, loop_key = jax.random.split(rng)
    if init_noise is None:
        x = jax.random.normal(init_key, (batch_size, traj_len, num_channels))
    else:
        x = jnp.asarray(init_noise, jnp.float32)
    x = _pin_endpoints(x, start, goal)

    def model_step(x, t):
        """Posterior reverse step at (traced or static) timestep t."""
        tf = jnp.asarray(t, jnp.float32)
        eps = apply_fn(params, x, tf[None])
        alpha = schedule.alpha[t - 1]
        alpha_bar = schedule.alpha_bar[t - 1]
        beta = schedule.beta[t - 1]
        if step_noise is None:
            z = jax.random.normal(jax.random.fold_in(loop_key, t), x.shape)
        else:
            z = jnp.asarray(step_noise, jnp.float32)[t - 1]
        z = jnp.where(jnp.asarray(t) == 1, 0.0, z)
        x = (x - ((1.0 - alpha) / jnp.sqrt(1.0 - alpha_bar)) * eps) \
            / jnp.sqrt(alpha)
        return x + beta * z

    # per-step hyperparameter schedules pre-transposed to (T, B): inside the
    # scan, [t-1] is then a contiguous-row dynamic slice instead of a
    # strided column gather of a (B, T) array at a traced index
    expansion_t = guide.expansion.T
    clearance_t = guide.clearance.T
    schedule_t = guide.guidance_schedule.T

    if guidance_fn is None:
        # default engine: lane-resident guided step (everything
        # t-independent hoisted out of the scan — see _make_lane_guided_update)
        guided_update = _make_lane_guided_update(
            scene, guide, start, goal, batch_size,
            expansion_t, clearance_t, schedule_t)
    else:
        def guided_update(x, t):
            interior = clip_joints(x[:, 1:-1, :])
            obs_lo, obs_hi = obstacle_aabbs(
                scene,
                expansion=expansion_t[t - 1],
                clearance=clearance_t[t - 1],
            )
            B = x.shape[0]
            obs_lo = jnp.broadcast_to(obs_lo, (B,) + obs_lo.shape[-2:])
            obs_hi = jnp.broadcast_to(obs_hi, (B,) + obs_hi.shape[-2:])
            # engine slot: custom gradient (pallas_grad.py / fast_guide.py)
            g = guidance_fn(interior, start, goal, obs_lo, obs_hi, guide)
            scale = schedule_t[t - 1][:, None, None]
            return x.at[:, 1:-1, :].add(-scale * g)

    guided_update = _with_assist(guided_update, guide, scene)

    if guidance_period == 2:
        # Fast path: the guided timesteps (even t >= guidance_min_t) are
        # statically known, so the scan runs (odd step, even step, guidance)
        # triples with NO lax.cond — every branch is straight-line code.
        lowest = guidance_min_t if guidance_min_t % 2 == 0 \
            else guidance_min_t + 1
        T_odd = T if T % 2 == 1 else T - 1
        if T % 2 == 0 and T >= guidance_min_t:
            x = _pin_endpoints(guided_update(model_step(x, T), T), start, goal)
        elif T % 2 == 0:
            x = _pin_endpoints(model_step(x, T), start, goal)

        n_pairs = max((T_odd - 1 - lowest) // 2 + 1, 0)

        def pair(carry, k):
            x = carry
            t_odd = T_odd - 2 * k
            x = _pin_endpoints(model_step(x, t_odd), start, goal)
            t_even = t_odd - 1
            x = guided_update(model_step(x, t_even), t_even)
            x = _pin_endpoints(x, start, goal)
            return x, ()

        if n_pairs > 0:
            x, _ = jax.lax.scan(pair, x, jnp.arange(n_pairs))
            tail_top = T_odd - 2 * n_pairs  # first unguided tail step
        else:
            tail_top = T_odd

        def tail(carry, t):
            return _pin_endpoints(model_step(carry, t), start, goal), ()

        if tail_top >= 1:
            x, _ = jax.lax.scan(tail, x, jnp.arange(tail_top, 0, -1))
        return x

    # generic cadence: cond-gated guidance per step
    def step(carry, t):
        x = model_step(carry, t)
        do_guide = jnp.logical_and(t % guidance_period < guidance_period // 2,
                                   t >= guidance_min_t)
        x = jax.lax.cond(do_guide, lambda x: guided_update(x, t),
                         lambda x: x, x)
        return _pin_endpoints(x, start, goal), ()

    x, _ = jax.lax.scan(step, x, jnp.arange(T, 0, -1))
    return x


def denoise_guided_ddim(
    apply_fn: Callable,
    params,
    schedule: DiffusionSchedule,
    scene: SceneObstacles,
    guide: GuideParams,
    start: jnp.ndarray,
    goal: jnp.ndarray,
    rng: jax.Array,
    *,
    batch_size: int,
    num_steps: int = 32,
    traj_len: int = C.DEFAULT_TRAJ_LEN,
    num_channels: int = C.DEFAULT_NUM_CHANNELS,
    guidance_fn=None,
    guidance_period: int = 1,
):
    """Accelerated guided sampling: deterministic DDIM (eta=0) over a
    ``num_steps``-point subsequence of the T-step schedule, with ensemble
    guidance applied at EVERY coarse step.

    A capability beyond the reference (which always runs all T reverse
    steps): ~T/num_steps fewer UNet evaluations at some quality cost; the
    per-sample hyperparameter schedules index the original timesteps, so the
    ensemble semantics carry over unchanged.

    ``guidance_period``: apply guidance every k-th coarse step (always
    including the first); 1 = every step.  The cadence/quality frontier is
    studied in docs/ddim_cadence.md.
    """
    T = schedule.T
    start = jnp.asarray(start, jnp.float32)
    goal = jnp.asarray(goal, jnp.float32)

    # integer timestep subsequence T = tau_0 > tau_1 > ... > tau_{K-1} = 1
    taus = np.unique(np.round(np.linspace(T, 1, num_steps)).astype(np.int64))[::-1]
    taus = jnp.asarray(taus.copy())
    K = taus.shape[0]

    init_key, _ = jax.random.split(rng)
    x = jax.random.normal(init_key, (batch_size, traj_len, num_channels))
    x = _pin_endpoints(x, start, goal)

    # (T, B) schedule transposes: contiguous-row slices inside the scan
    expansion_t = guide.expansion.T
    clearance_t = guide.clearance.T
    schedule_t = guide.guidance_schedule.T

    if guidance_fn is None:
        guided_update = _make_lane_guided_update(
            scene, guide, start, goal, batch_size,
            expansion_t, clearance_t, schedule_t)
    else:
        def guided_update(x, t):
            interior = clip_joints(x[:, 1:-1, :])
            obs_lo, obs_hi = obstacle_aabbs(
                scene, expansion=expansion_t[t - 1],
                clearance=clearance_t[t - 1])
            B = x.shape[0]
            obs_lo = jnp.broadcast_to(obs_lo, (B,) + obs_lo.shape[-2:])
            obs_hi = jnp.broadcast_to(obs_hi, (B,) + obs_hi.shape[-2:])
            g = guidance_fn(interior, start, goal, obs_lo, obs_hi,
                            guide)  # includes the grad_norm option
            scale = schedule_t[t - 1][:, None, None]
            return x.at[:, 1:-1, :].add(-scale * g)

    guided_update = _with_assist(guided_update, guide, scene)

    def step(x, k):
        t = taus[k]
        t_next = jnp.where(k + 1 < K, taus[jnp.minimum(k + 1, K - 1)], 0)
        eps = apply_fn(params, x, t.astype(jnp.float32)[None])
        ab_t = schedule.alpha_bar[t - 1]
        ab_n = jnp.where(t_next >= 1, schedule.alpha_bar[t_next - 1], 1.0)
        x0 = (x - jnp.sqrt(1.0 - ab_t) * eps) / jnp.sqrt(ab_t)
        x = jnp.sqrt(ab_n) * x0 + jnp.sqrt(1.0 - ab_n) * eps

        if guidance_period <= 0:
            pass  # guidance disabled (A/B probes, bench --no-guidance)
        elif guidance_period > 1:
            x = jax.lax.cond(k % guidance_period == 0,
                             lambda x: guided_update(x, t), lambda x: x, x)
        else:
            x = guided_update(x, t)
        return _pin_endpoints(x, start, goal), ()

    x, _ = jax.lax.scan(step, x, jnp.arange(K))
    return x


def denoise(
    apply_fn: Callable,
    params,
    schedule: DiffusionSchedule,
    rng: jax.Array,
    *,
    batch_size: int = 1,
    traj_len: int = C.DEFAULT_TRAJ_LEN,
    num_channels: int = C.DEFAULT_NUM_CHANNELS,
    start=None,
    goal=None,
):
    """Unguided reverse DDPM (diffusion/diffusion.py:253-278)."""
    T = schedule.T
    condition = start is not None

    init_key, loop_key = jax.random.split(rng)
    x = jax.random.normal(init_key, (batch_size, traj_len, num_channels))
    if condition:
        x = _pin_endpoints(x, jnp.asarray(start, jnp.float32),
                           jnp.asarray(goal, jnp.float32))

    def step(x, t):
        eps = apply_fn(params, x, t.astype(jnp.float32)[None])
        alpha = schedule.alpha[t - 1]
        alpha_bar = schedule.alpha_bar[t - 1]
        beta = schedule.beta[t - 1]
        z = jax.random.normal(jax.random.fold_in(loop_key, t), x.shape)
        z = jnp.where(t == 1, 0.0, z)
        x = (x - ((1.0 - alpha) / jnp.sqrt(1.0 - alpha_bar)) * eps) / jnp.sqrt(alpha)
        x = x + beta * z
        if condition:
            x = _pin_endpoints(x, jnp.asarray(start, jnp.float32),
                               jnp.asarray(goal, jnp.float32))
        return x, ()

    x, _ = jax.lax.scan(step, x, jnp.arange(T, 0, -1))
    return x


def q_sample_from_x0(schedule: DiffusionSchedule, x0, t, eps):
    """Closed-form forward diffusion q(x_t | x_0) (diffusion.py:79-105).

    x0: (B, N, C); t: (B,) int in [1, T]; eps: (B, N, C).
    """
    ab = schedule.alpha_bar[t - 1][:, None, None]
    return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * eps


def generate_q_sample(schedule: DiffusionSchedule, x0, rng, condition=True):
    """Training batch: (x_t, eps, t) with endpoint conditioning
    (diffusion.py:201-251)."""
    B = x0.shape[0]
    tkey, ekey = jax.random.split(rng)
    t = jax.random.randint(tkey, (B,), 1, schedule.T + 1)
    eps = jax.random.normal(ekey, x0.shape)
    xt = q_sample_from_x0(schedule, x0, t, eps)
    if condition:
        xt = xt.at[:, 0, :].set(x0[:, 0, :])
        xt = xt.at[:, -1, :].set(x0[:, -1, :])
    return xt, eps, t
