"""Self-collision + joint-limit "assist" guidance terms.

The reference's guide ensemble carries only OBSTACLE-collision costs
(lib/guide.py:354-537); nothing steers samples away from self-collision or
joint-limit violations, because its expert-data prior (MPiNets trajectories)
rarely produces either.  A from-scratch prior does: on the round-3 128-scene
protocol corpus 65/128 strict failures were self-collisions and 12 joint
limits (VERDICT r3, failure definitions mpinets/metrics.py:278-291,334-345).

These two additional differentiable cost terms close that gap:

  * self-collision: hinge on the inscribed-capsule clearance model of
    :mod:`edmp_tpu.robot.self_collision` — the same geometry the evaluator
    penalizes, made jittable/differentiable here (JAX segment distances
    through batched FK).
  * joint limits: quadratic hinge outside the sampler's joint limits (the
    evaluator's violation check, mpinets/metrics.py:334-345).  Evaluated on
    the UNCLIPPED state: the sampler clips only the copy fed to the obstacle
    guide (diffusion/diffusion.py:328-341), so the emitted trajectory can
    sit outside the limits unless something pushes it back.

Both are per-sample weighted through :class:`GuideParams`
(``self_collision_weight`` / ``joint_limit_weight``); weight 0 — the
default, and the reference-parity setting — compiles to the identical
program as before (the branch is statically elided).  Measured A/B on the
protocol corpus: docs/assist_study.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from edmp_tpu import constants as C
from edmp_tpu.robot import kinematics as kin
from edmp_tpu.robot.self_collision import (CAPSULE_HALF_LEN, CAPSULE_RADIUS,
                                           SELF_PAIRS, _AXIS)

_PI = np.asarray([p[0] for p in SELF_PAIRS])
_PJ = np.asarray([p[1] for p in SELF_PAIRS])
_RADIUS_SUM = (CAPSULE_RADIUS[_PI] + CAPSULE_RADIUS[_PJ]).astype(np.float32)
_AXIS_ONEHOT = np.eye(3, dtype=np.float32)[_AXIS]          # (9, 3)
_HALF_LEN = CAPSULE_HALF_LEN.astype(np.float32)

# limits the evaluator enforces (metrics/evaluator.py:128-130)
_LOWER = np.asarray(C.JOINT_LIMITS_LOWER, np.float32)
_UPPER = np.asarray(C.JOINT_LIMITS_UPPER, np.float32)

# hinge margins: costs activate BEFORE the hard boundary so gradients exist
# while the sample is still (barely) feasible.  3 cm mirrors the reference's
# collision hinge margin (mpinets/loss.py:47-94); the joint margin is small —
# the evaluator's check is exact (tolerance 1e-9 rad).
DEFAULT_SC_MARGIN = 0.03
DEFAULT_JL_MARGIN = 0.01


def _segment_distance(a0, a1, b0, b1):
    """Min distance between segments [a0,a1], [b0,b1]; (..., 3) -> (...).

    Same clamped closed form as robot/self_collision.segment_distance
    (Ericson 5.1.9), with an eps-regularised norm so jax.grad stays finite
    at contact.
    """
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    eps = 1e-12
    a_s = jnp.maximum(a, eps)
    e_s = jnp.maximum(e, eps)
    denom = a * e - b * b
    s = jnp.where(denom > eps,
                  jnp.clip((b * f - c * e) / jnp.maximum(denom, eps), 0.0, 1.0),
                  0.0)
    t = jnp.clip((b * s + f) / e_s, 0.0, 1.0)
    s = jnp.clip((b * t - c) / a_s, 0.0, 1.0)
    pa = a0 + s[..., None] * d1
    pb = b0 + t[..., None] * d2
    diff = pa - pb
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + eps)


def capsule_clearances(joints):
    """Per-pair capsule surface clearance, (..., 7) -> (..., P).

    Negative entries are self-collisions.  JAX twin of
    robot/self_collision.min_pair_clearance (same capsules, same pairs),
    batched over arbitrary leading dims and differentiable.
    """
    R, p = kin.link_box_frames(joints)                     # (..., 9, 3, 3/3)
    axis_dir = jnp.einsum("...lij,lj->...li", R,
                          jnp.asarray(_AXIS_ONEHOT, joints.dtype),
                          precision=jax.lax.Precision.HIGHEST)
    off = axis_dir * jnp.asarray(_HALF_LEN, joints.dtype)[:, None]
    a0, a1 = p - off, p + off                              # (..., 9, 3)
    d = _segment_distance(a0[..., _PI, :], a1[..., _PI, :],
                          a0[..., _PJ, :], a1[..., _PJ, :])
    return d - jnp.asarray(_RADIUS_SUM, joints.dtype)


def self_collision_cost(joints, margin: float = DEFAULT_SC_MARGIN):
    """Sum of squared capsule-clearance hinge violations.

    joints: (..., 7); scalar.  Quadratic hinge: smooth at the activation
    boundary, growing gradient with penetration depth.
    """
    pen = jnp.maximum(margin - capsule_clearances(joints), 0.0)
    return jnp.sum(pen * pen)


def joint_limit_cost(joints, margin: float = DEFAULT_JL_MARGIN):
    """Sum of squared joint-limit hinge violations (evaluator limits)."""
    lo = jnp.asarray(_LOWER, joints.dtype) + margin
    hi = jnp.asarray(_UPPER, joints.dtype) - margin
    over = jnp.maximum(joints - hi, 0.0)
    under = jnp.maximum(lo - joints, 0.0)
    return jnp.sum(over * over + under * under)


def _lane_major_capsule_depths(trajs):
    """Summed capsule penetration depth per sample, lane-major: (B, N, 7)
    -> (B,).

    Same capsule model as :func:`capsule_clearances`, in the guidance
    kernel's batch-last scalar-of-arrays dataflow (grad_kernel.py): the
    naive ``(..., 9, 3, 3)`` layout materialises ~50 MB FK intermediates
    per call and cost the fast+safe mode ~33% (docs/ddim_mfu.md lesson,
    applied to the safety-selection path).  Endpoints per capsule are
    ``p ± R[:, axis] * half_len`` — one rotation COLUMN per link, never the
    full matrix.
    """
    from edmp_tpu.costs.grad_kernel import _fk_forward, _joint_frame
    from edmp_tpu.costs.grad_kernel import _LJ as LJ
    from edmp_tpu.costs.grad_kernel import _LR as LR
    from edmp_tpu.costs.grad_kernel import _LT as LT

    qT = jnp.transpose(trajs, (2, 1, 0))             # (7, W, B)
    Rs, ps, _ = _fk_forward([qT[j] for j in range(7)])
    ends = []                                        # per link: (a0, a1)
    for l in range(9):
        j = int(LJ[l])
        R, p = _joint_frame(Rs, ps, j)
        A, t = LR[l], LT[l]
        ax = int(_AXIS[l])
        hl = float(_HALF_LEN[l])
        a0, a1 = [], []
        for i in range(3):
            # box center and world axis column (R_joint @ A)[:, ax]
            c = p[i] + R[i][0] * float(t[0]) + R[i][1] * float(t[1]) \
                + R[i][2] * float(t[2])
            d = (R[i][0] * float(A[0, ax]) + R[i][1] * float(A[1, ax])
                 + R[i][2] * float(A[2, ax])) * hl
            a0.append(c - d)
            a1.append(c + d)
        ends.append((a0, a1))

    def seg_dist(pa, pb):
        """(a0, a1) plane-triples x2 -> min segment distance (W, B)."""
        (a0, a1), (b0, b1) = pa, pb
        d1 = [a1[k] - a0[k] for k in range(3)]
        d2 = [b1[k] - b0[k] for k in range(3)]
        r = [a0[k] - b0[k] for k in range(3)]
        dot = lambda u, v: u[0] * v[0] + u[1] * v[1] + u[2] * v[2]
        a = dot(d1, d1)
        e = dot(d2, d2)
        f = dot(d2, r)
        c = dot(d1, r)
        b = dot(d1, d2)
        eps = 1e-12
        denom = a * e - b * b
        s = jnp.where(denom > eps,
                      jnp.clip((b * f - c * e) / jnp.maximum(denom, eps),
                               0.0, 1.0), 0.0)
        t_ = jnp.clip((b * s + f) / jnp.maximum(e, eps), 0.0, 1.0)
        s = jnp.clip((b * t_ - c) / jnp.maximum(a, eps), 0.0, 1.0)
        d2sum = 0.0
        for k in range(3):
            diff = (a0[k] + s * d1[k]) - (b0[k] + t_ * d2[k])
            d2sum = d2sum + diff * diff
        return jnp.sqrt(d2sum + eps)

    depth = 0.0
    for i, j in SELF_PAIRS:
        d = seg_dist(ends[i], ends[j])               # (W, B)
        rsum = float(CAPSULE_RADIUS[i] + CAPSULE_RADIUS[j])
        depth = depth + jnp.sum(jnp.maximum(rsum - d, 0.0), axis=0)
    return depth                                      # (B,)


def min_clearance_per_config(joints):
    """Min capsule clearance over pairs, (..., 7) -> (...).  Negative =
    self-collision.  Used by goal filtering and safety-aware selection."""
    return jnp.min(capsule_clearances(joints), axis=-1)


# violation-class bits for the selection mask (spooled per scene so safe-
# mode records stay cost-comparable with unsafe ones — the penalty and the
# raw swept cost are recorded SEPARATELY)
VIOLATION_SELF_COLLISION = 1
VIOLATION_JOINT_LIMIT = 2
VIOLATION_ENV_PREDICTED = 4
VIOLATION_NAMES = {VIOLATION_SELF_COLLISION: "self_collision",
                   VIOLATION_JOINT_LIMIT: "joint_limit",
                   VIOLATION_ENV_PREDICTED: "env_predicted"}


def violation_class_names(mask: int):
    """Decode a violation bitmask into its class names (spool field)."""
    return [name for bit, name in sorted(VIOLATION_NAMES.items())
            if int(mask) & bit]


def safety_penalty_terms(trajs, swept_costs=None, penalty: float = 1e3):
    """Per-sample selection penalties + violation-class bitmask.

    trajs : (B, N, 7) FULL trajectories (endpoints included).  Returns
    ``(pen, mask)``: ``pen`` (B,) is 0 for samples clean on every axis and
    >= ``penalty`` per violated axis, scaled by the violation depth so among
    all-dirty batches the least-violating sample still wins; ``mask`` (B,)
    int32 carries one bit per violated class (VIOLATION_* constants).  Raw
    swept obstacle costs are O(1e-2), so the penalty dominates them:
    selection becomes class-hierarchical — fully-clean samples beat
    single-violation samples beat multi-violation ones, with min swept
    volume breaking ties within a class (the batch-is-the-fix design: with
    120 samples/scene, steering only has to make SOME samples clean, not
    all).

    The env term uses the swept-volume signal itself: zero swept volume on
    the conservative AABB-hull model GUARANTEES a collision-free path, so
    ``swept > 0`` = predicted collision.  Without it (round-4 first
    measurement, docs/assist_study.md safe_only arm) selection traded
    obstacle quality for capsule cleanliness: env collisions rose
    14% -> 22% while self-collisions fell.
    """
    sc_depth = _lane_major_capsule_depths(trajs)         # (B,)
    lo = jnp.asarray(_LOWER, trajs.dtype)
    hi = jnp.asarray(_UPPER, trajs.dtype)
    jl_depth = jnp.sum(jnp.maximum(trajs - hi, 0.0)
                       + jnp.maximum(lo - trajs, 0.0), axis=(1, 2))
    sc_bad = sc_depth > 0
    jl_bad = jl_depth > 0
    pen = (penalty * jnp.minimum(1.0 + sc_depth, 2.0) * sc_bad
           + penalty * jnp.minimum(1.0 + jl_depth, 2.0) * jl_bad)
    mask = (VIOLATION_SELF_COLLISION * sc_bad.astype(jnp.int32)
            + VIOLATION_JOINT_LIMIT * jl_bad.astype(jnp.int32))
    if swept_costs is not None:
        env_bad = swept_costs > 0.0
        pen = pen + penalty * env_bad
        mask = mask + VIOLATION_ENV_PREDICTED * env_bad.astype(jnp.int32)
    return pen, mask


def trajectory_safety_penalties(trajs, swept_costs=None, penalty: float = 1e3):
    """Penalty-only wrapper of :func:`safety_penalty_terms`."""
    return safety_penalty_terms(trajs, swept_costs, penalty)[0]


def has_assist(guide) -> bool:
    """Static: does this ensemble carry any assist term?

    ``None`` weights are empty pytree nodes (they survive jit tracing as
    python None), so this check is compile-time: a guide with both weights
    None produces the byte-identical program as before the fields existed.
    Array weights count as active even when their runtime values are zero.
    """
    return (guide.self_collision_weight is not None
            or guide.joint_limit_weight is not None)


# trust cap on the self-collision step: bounds the per-waypoint joint-angle
# move per application so a large hinge gradient (deep penetration x large
# weight) cannot overshoot into oscillating divergence
SC_STEP_CAP = 0.05  # radians


def make_assist_update(guide, sc_margin: float = DEFAULT_SC_MARGIN,
                       sc_step_cap: float = SC_STEP_CAP):
    """Build the per-step assist update ``x -> x`` for the sampler, or None.

    Applied to the UNCLIPPED interior waypoints at every guided step, after
    the obstacle-gradient update (the guidance_schedule scale does NOT apply
    — assist terms are a capability beyond the reference with their own
    calibration, docs/assist_study.md).  Two updates, both divergence-safe:

      * joint limits: PARTIAL PROJECTION ``x -= w * (x - clip(x))`` — the
        gradient step on ``1/2 |x - clip(x)|^2``, a contraction for every
        w in (0, 1] (weights clamp to that range); w = 1 is exact
        projection onto the limit box.
      * self-collision: gradient step on the capsule-clearance hinge with a
        per-element trust cap of ``sc_step_cap`` radians, so deep
        penetrations move steadily instead of overshooting.
    """
    if not has_assist(guide):
        return None
    sc_w = guide.self_collision_weight
    jl_w = guide.joint_limit_weight

    if sc_w is not None:
        def sc_cost_sum(interior):
            pen = jnp.maximum(sc_margin - capsule_clearances(interior), 0.0)
            return jnp.sum(pen * pen)

        sc_grad = jax.grad(sc_cost_sum)

    def update(x):
        interior = x[:, 1:-1, :]
        step = jnp.zeros_like(interior)
        if jl_w is not None:
            w = jnp.clip(jl_w, 0.0, 1.0)[:, None, None]
            lo = jnp.asarray(_LOWER, interior.dtype)
            hi = jnp.asarray(_UPPER, interior.dtype)
            step = step + w * (interior - jnp.clip(interior, lo, hi))
        if sc_w is not None:
            g = sc_w[:, None, None] * sc_grad(interior)
            step = step + jnp.clip(g, -sc_step_cap, sc_step_cap)
        return x.at[:, 1:-1, :].add(-step)

    return update
