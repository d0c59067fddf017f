"""Exact-SDF environment-clearance guidance term.

The reference's guide costs are AABB overlap VOLUMES (lib/guide.py:354-537):
they are exactly zero — with exactly zero gradient — until a link box already
penetrates an (inflated) obstacle box.  The ensemble's clearance/expansion
schedules inflate obstacles to manufacture early gradients, but the gradient
direction is still "shrink the overlap volume", which is coarse near thin
walls and windows.  The round-4 failure analysis left 12/128 scenes whose env
collisions survive three independent reseeds (docs/retry_study.md) — scenes
where no sample in the batch ever goes fully clean.

This module adds the missing clearance-shaped term: a hinge on the EXACT
signed distance between the robot's inscribed capsules
(robot/self_collision.py geometry) and the scene's ORIENTED obstacle boxes
(not their world AABBs), with margin semantics borrowed from the MPiNets
collision loss (mpinets/loss.py:47-94: hinge on scene SDF at robot surface
points).  Unlike the volume costs it

  * is active at a DISTANCE (margin + capsule radius) before contact, and
  * pushes along the true nearest-face normal of the oriented box,

so guidance can steer samples *around* thin geometry instead of only
resolving penetrations after they happen.

Wired as a per-sample weighted assist update (``GuideParams.
env_clearance_weight``); weight None — the default and the reference-parity
setting — statically elides the term from the compiled program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from edmp_tpu.costs.obstacles import SceneObstacles
from edmp_tpu.robot import kinematics as kin
from edmp_tpu.robot.self_collision import (CAPSULE_HALF_LEN, CAPSULE_RADIUS,
                                           _AXIS)

_AXIS_ONEHOT = np.eye(3, dtype=np.float32)[_AXIS]          # (9, 3)
_HALF_LEN = CAPSULE_HALF_LEN.astype(np.float32)
_RADIUS = CAPSULE_RADIUS.astype(np.float32)

# capsule-axis sample points (fractions of ±half_len): endpoints + midpoints.
# 5 points per capsule bounds the sphere-swept approximation error of the
# segment-box distance at half_len/4 per link.
_T_SAMPLES = np.asarray([-1.0, -0.5, 0.0, 0.5, 1.0], np.float32)

# hinge margin: activate 2 cm before capsule-surface contact (the MPiNets
# loss uses 3 cm at the point-cloud surface; our capsules already carry the
# link's inscribed radius, so a slightly tighter margin balances steering
# strength against over-conservatism in narrow windows)
DEFAULT_ENV_MARGIN = 0.02
# per-element trust cap on the gradient step (radians) — same
# divergence-safety device as costs/assist.SC_STEP_CAP
ENV_STEP_CAP = 0.05


def capsule_surface_points(joints):
    """Sample points on the 9 link-capsule axes, (..., 7) -> (..., 9, P, 3).

    Points are ``p + R @ axis * t * half_len`` for t in ``_T_SAMPLES`` —
    the sphere-swept representation of each capsule, so
    ``sdf(point) - radius`` is (an upper bound of) the link's surface
    clearance.
    """
    R, p = kin.link_box_frames(joints)                     # (..., 9, 3, 3/3)
    axis_dir = jnp.einsum("...lij,lj->...li", R,
                          jnp.asarray(_AXIS_ONEHOT, joints.dtype),
                          precision=jax.lax.Precision.HIGHEST)
    off = axis_dir * jnp.asarray(_HALF_LEN, joints.dtype)[:, None]
    t = jnp.asarray(_T_SAMPLES, joints.dtype)
    return p[..., :, None, :] + off[..., :, None, :] * t[:, None]


def oriented_box_sdf(points, scene: SceneObstacles):
    """Min signed distance of each point to the scene's ORIENTED boxes.

    points : (B, ..., 3) with a leading axis matching per-sample scene
    arrays (scene.centers (B, O, 3)) or an unbatched scene ((O, 3)).
    Returns the same shape as ``points`` minus the last axis.  Padded
    obstacles (zero dims, far-away phantom centers) yield huge distances,
    so no explicit masking is needed.
    """
    if scene.rot is None:
        raise ValueError("scene has no full rotations (rot=None); rebuild "
                         "it with costs.obstacles.pack_scene")
    centers, rot, half = scene.centers, scene.rot, scene.dims * 0.5
    if centers.ndim == 2:                                  # unbatched scene
        centers, rot, half = (centers[None], rot[None], half[None])
        points = points[None]
        squeeze = True
    else:
        squeeze = False
    B = centers.shape[0]
    flat = points.reshape(B, -1, 3)                        # (B, M, 3)
    # local = R^T (pt - c): einsum over the obstacle axis
    rel = flat[:, :, None, :] - centers[:, None, :, :]     # (B, M, O, 3)
    local = jnp.einsum("boji,bmoj->bmoi", rot, rel)
    q = jnp.abs(local) - half[:, None, :, :]
    sq = jnp.sum(jnp.square(jnp.maximum(q, 0.0)), axis=-1)
    pos = sq > 0
    outside = jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    sdf = jnp.min(outside + inside, axis=-1)               # (B, M)
    sdf = sdf.reshape(points.shape[:-1])
    return sdf[0] if squeeze else sdf


def env_clearance_cost(joints, scene: SceneObstacles,
                       margin: float = DEFAULT_ENV_MARGIN):
    """Sum of squared capsule-vs-obstacle clearance hinge violations.

    joints : (B, N, 7) with per-sample scene arrays (or (N, 7)/unbatched).
    Quadratic hinge on ``sdf - radius`` at ``margin``, summed over samples,
    waypoints, links and axis points.
    """
    pts = capsule_surface_points(joints)                   # (B, N, 9, P, 3)
    sdf = oriented_box_sdf(pts, scene)                     # (B, N, 9, P)
    clear = sdf - jnp.asarray(_RADIUS, joints.dtype)[:, None]
    pen = jnp.maximum(margin - clear, 0.0)
    return jnp.sum(pen * pen)


def min_env_clearance(joints, scene: SceneObstacles):
    """Diagnostic: min capsule-surface clearance over the configuration(s).

    joints (..., 7) against an UNBATCHED scene.  Negative = predicted env
    collision on the capsule model.
    """
    pts = capsule_surface_points(joints)
    sdf = oriented_box_sdf(pts, scene)
    return jnp.min(sdf - jnp.asarray(_RADIUS, joints.dtype)[:, None],
                   axis=(-1, -2))


def make_clearance_update(guide, scene: SceneObstacles,
                          margin: float = DEFAULT_ENV_MARGIN,
                          step_cap: float = ENV_STEP_CAP):
    """Per-step assist update ``x -> x`` for the sampler, or None.

    Gradient step on :func:`env_clearance_cost` over the UNCLIPPED interior
    waypoints, scaled by the per-sample ``env_clearance_weight`` and
    trust-capped at ``step_cap`` radians per element (divergence safety,
    like the self-collision assist).  ``guide.env_clearance_weight is
    None`` returns None — the compiled program is unchanged.
    """
    w = getattr(guide, "env_clearance_weight", None)
    if w is None:
        return None

    def cost_sum(interior):
        return env_clearance_cost(interior, scene, margin)

    grad = jax.grad(cost_sum)

    def update(x):
        g = w[:, None, None] * grad(x[:, 1:-1, :])
        return x.at[:, 1:-1, :].add(-jnp.clip(g, -step_cap, step_cap))

    return update
