"""Ensemble-of-costs collision guidance, differentiated with ``jax.grad``.

This is the TPU replacement for the reference's autograd cost engine
(``lib/guide.py``): batched Franka FK -> world link AABBs -> AABB overlap
volumes against obstacle AABBs, with *per-sample* hyperparameters so one fused
kernel serves the whole guide ensemble (H guides x B samples stacked on the
batch axis, ``infer_serial.py:56-91``).

All functions are pure and jit/vmap/grad-safe.  Trajectory layout is
channels-last ``(B, N, 7)`` internally (waypoints on the sublane axis,
features on lanes); the reference's ``(B, 7, N)`` layout is converted at API
edges only.

Parity anchors:
  * intersection volume cost        lib/guide.py:354-395
  * swept volume cost               lib/guide.py:473-537
  * blended gradient + grad-norm    lib/guide.py:597-635
  * best-trajectory selection       lib/guide.py:637-653
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from edmp_tpu.costs.obstacles import SceneObstacles, obstacle_aabbs
from edmp_tpu.robot import kinematics as kin


class GuideParams(NamedTuple):
    """Per-sample guide-ensemble hyperparameters (packed from guide YAMLs).

    Shapes: B = H guides x samples-per-guide, T = diffusion steps.
    Packing semantics mirror infer_serial.py:59-91.
    """

    clearance: jnp.ndarray          # (B, T)
    expansion: jnp.ndarray          # (B, T)
    guidance_method: jnp.ndarray    # (B,)  0 = intersection, 1 = swept volume
    grad_norm: jnp.ndarray          # (B,)  0/1: whole-tensor gradient normalisation
    guidance_schedule: jnp.ndarray  # (B, T) gradient step scale per step
    # assist terms beyond the reference (costs/assist.py): per-sample step
    # sizes for the self-collision capsule hinge and the joint-limit hinge.
    # None (the default) statically elides the terms — None is an EMPTY
    # pytree node, so it survives jit tracing as-is and the reference-parity
    # program is byte-identical to a GuideParams without these fields.
    self_collision_weight: jnp.ndarray | None = None   # (B,) or None
    joint_limit_weight: jnp.ndarray | None = None      # (B,) or None
    # exact-SDF environment-clearance hinge (costs/clearance.py): per-sample
    # gradient step weight.  None (default) statically elides the term.
    env_clearance_weight: jnp.ndarray | None = None    # (B,) or None

    @property
    def batch(self) -> int:
        return self.guidance_method.shape[-1]


def intersection_volumes(joints, obs_lo, obs_hi):
    """Per-(sample, waypoint, link, obstacle) AABB intersection volumes.

    joints : (B, N, 7); obs_lo/hi : (B, O, 3) or (O, 3).
    Returns (B, N, L, O).  Matches lib/guide.py:354-395.
    """
    lo, hi = kin.link_aabbs(joints)          # (B, N, L, 3)
    if obs_lo.ndim == 2:
        obs_lo = obs_lo[None]
        obs_hi = obs_hi[None]
    ov_lo = jnp.maximum(lo[..., :, None, :], obs_lo[:, None, None, :, :])
    ov_hi = jnp.minimum(hi[..., :, None, :], obs_hi[:, None, None, :, :])
    return jnp.prod(jnp.clip(ov_hi - ov_lo, min=0.0), axis=-1)


def _with_endpoints(joints, start, goal):
    """Concatenate start/goal onto (B, N, 7) -> (B, N+2, 7).

    ``goal`` may be (7,) shared or (B, 7) per-sample (the IK-filter path feeds
    per-sample goals, lib/guide.py:487-490).
    """
    B = joints.shape[0]
    start_b = jnp.broadcast_to(start, (B, joints.shape[-1]))[:, None, :]
    goal_b = jnp.broadcast_to(goal, (B, joints.shape[-1]))[:, None, :]
    return jnp.concatenate([start_b, joints, goal_b], axis=1)


def swept_volumes(joints, start, goal, obs_lo, obs_hi):
    """Swept-volume cost: AABB hull of consecutive waypoints vs obstacles.

    joints : (B, N, 7) interior waypoints; start/goal appended as endpoints.
    Returns (B, N+1, L, O).  Matches lib/guide.py:473-537.
    """
    traj = _with_endpoints(joints, start, goal)
    lo, hi = kin.link_aabbs(traj)            # (B, N+2, L, 3)
    seg_lo = jnp.minimum(lo[:, :-1], lo[:, 1:])
    seg_hi = jnp.maximum(hi[:, :-1], hi[:, 1:])
    if obs_lo.ndim == 2:
        obs_lo = obs_lo[None]
        obs_hi = obs_hi[None]
    ov_lo = jnp.maximum(seg_lo[..., :, None, :], obs_lo[:, None, None, :, :])
    ov_hi = jnp.minimum(seg_hi[..., :, None, :], obs_hi[:, None, None, :, :])
    return jnp.prod(jnp.clip(ov_hi - ov_lo, min=0.0), axis=-1)


def _overlap_volumes(lo, hi, obs_lo, obs_hi):
    """(B, N, L, 3) box AABBs x (B|1, O, 3) obstacle AABBs -> (B, N, L, O)."""
    if obs_lo.ndim == 2:
        obs_lo = obs_lo[None]
        obs_hi = obs_hi[None]
    ov_lo = jnp.maximum(lo[..., :, None, :], obs_lo[:, None, None, :, :])
    ov_hi = jnp.minimum(hi[..., :, None, :], obs_hi[:, None, None, :, :])
    return jnp.prod(jnp.clip(ov_hi - ov_lo, min=0.0), axis=-1)


def blended_cost(joints, start, goal, obs_lo, obs_hi, guidance_method):
    """Scalar ensemble cost: per-sample iv/sv blend (lib/guide.py:611-612).

    One shared FK pass serves both cost families: the intersection cost uses
    the interior waypoints' link AABBs, the swept cost the consecutive-pair
    hulls of the endpoint-extended trajectory — numerically identical to
    evaluating lib/guide.py:354 and :473 separately, at half the FK work.
    """
    m = guidance_method
    traj = _with_endpoints(joints, start, goal)     # (B, N+2, 7)
    lo, hi = kin.link_aabbs(traj)                   # (B, N+2, L, 3)
    iv = _overlap_volumes(lo[:, 1:-1], hi[:, 1:-1], obs_lo, obs_hi)
    seg_lo = jnp.minimum(lo[:, :-1], lo[:, 1:])
    seg_hi = jnp.maximum(hi[:, :-1], hi[:, 1:])
    sv = _overlap_volumes(seg_lo, seg_hi, obs_lo, obs_hi)
    civ = jnp.sum(iv, axis=(1, 2, 3))
    csv = jnp.sum(sv, axis=(1, 2, 3))
    return jnp.sum((1.0 - m) * civ + m * csv)


def guidance_gradient(joints, start, goal, obs_lo, obs_hi, guide: GuideParams):
    """Cost gradient w.r.t. the interior waypoints, with per-sample options.

    joints : (B, N, 7) (already joint-limit clipped by the caller, like
    diffusion/diffusion.py:328).  Returns (B, N, 7).

    Reproduces the reference's whole-tensor gradient normalisation quirk
    (lib/guide.py:627-629): samples with grad_norm=1 are scaled by the
    Frobenius norm of the ENTIRE batch gradient tensor, not their own row.
    """
    g = jax.grad(blended_cost)(joints, start, goal, obs_lo, obs_hi,
                               guide.guidance_method)
    # zero-gradient guard (see fast_guide.guidance_gradient_fast)
    norm = jnp.maximum(jnp.linalg.norm(g.reshape(-1)), 1e-30)
    gn = guide.grad_norm[:, None, None]
    return (1.0 - gn) * g + gn * (g / norm)


def interpolation_volumes(joints, start, goal, obs_lo, obs_hi):
    """'ipv' interpolated-waypoint cost (lib/guide.py:397-471, unused by the
    shipped configs but part of the guide API): intersection volumes at the
    1/4, 1/2 and 3/4 blend points of every consecutive waypoint pair of the
    endpoint-extended trajectory.  Returns (B, N+1, L, O) summed over the 3
    interpolants."""
    traj = _with_endpoints(joints, start, goal)
    total = None
    for w in (0.5, 0.75, 0.25):
        mid = w * traj[:, 1:, :] + (1.0 - w) * traj[:, :-1, :]
        lo, hi = kin.link_aabbs(mid)
        v = _overlap_volumes(lo, hi, obs_lo, obs_hi)
        total = v if total is None else total + v
    return total


def smoothness_cost(joints, start, goal):
    """Quadratic consecutive-difference smoothness (lib/guide.py:670-677).

    joints: (B, N, 7) interior waypoints."""
    start = jnp.broadcast_to(start, joints[:, 0, :].shape)
    goal = jnp.broadcast_to(goal, joints[:, 0, :].shape)
    c = jnp.sum((joints[:, 0, :] - start) ** 2)
    c += jnp.sum((joints[:, 2:-1, :] - joints[:, 1:-2, :]) ** 2)
    c += jnp.sum((goal - joints[:, -1, :]) ** 2)
    return c


def swept_cost_per_sample(joints, start, goal, scene: SceneObstacles):
    """Total swept volume per sample at t=0 (selection metric).

    Matches choose_best_trajectory's ``define_obstacles(cfg, 0)`` + summed
    swept_volume_cost (lib/guide.py:637-653).
    """
    obs_lo, obs_hi = obstacle_aabbs(scene)
    return jnp.sum(swept_volumes(joints, start, goal, obs_lo, obs_hi),
                   axis=(1, 2, 3))


def best_trajectory_index(joints, start, goal, scene: SceneObstacles):
    """argmin of swept volume over the batch (lib/guide.py:648)."""
    return jnp.argmin(swept_cost_per_sample(joints, start, goal, scene))


def swept_volumes_final(joints, obs_lo, obs_hi):
    """The reference's UNUSED ``swept_volume_cost_final`` variant
    (lib/guide.py:539-595), kept for API completeness: swept volume over a
    trajectory whose endpoint rows are ZERO configurations (the reference
    allocates ``torch.zeros`` and never writes start/goal into rows 0/-1 —
    the endpoint assignments are commented out at :549-550).

    joints : (B, N, 7) interior waypoints.  Returns (B, N+1, L, O).
    """
    zeros = jnp.zeros_like(joints[:, :1, :])
    traj = jnp.concatenate([zeros, joints, zeros], axis=1)
    lo, hi = kin.link_aabbs(traj)
    seg_lo = jnp.minimum(lo[:, :-1], lo[:, 1:])
    seg_hi = jnp.maximum(hi[:, :-1], hi[:, 1:])
    return _overlap_volumes(seg_lo, seg_hi, obs_lo, obs_hi)


def best_trajectory_final(trajectories, scene: SceneObstacles):
    """The reference's UNUSED ``choose_best_trajectory_final``
    (lib/guide.py:655-668): argmin of the summed zero-endpoint swept volume
    at t=0 over the batch.  trajectories : (B, N, 7); returns the (N, 7)
    winner."""
    obs_lo, obs_hi = obstacle_aabbs(scene)
    vols = jnp.sum(swept_volumes_final(trajectories[:, 1:-1, :],
                                       obs_lo, obs_hi), axis=(1, 2, 3))
    return trajectories[jnp.argmin(vols)]


def ik_goal_volumes(goals, scene: SceneObstacles):
    """Intersection volume of each candidate IK goal configuration.

    goals : (K, 7).  Treats each goal as a 1-waypoint trajectory at t=0
    (infer_serial.py:119).  Returns (K,).
    """
    vols = intersection_volumes(goals[:, None, :], *obstacle_aabbs(scene))
    return jnp.sum(vols, axis=(1, 2, 3))
