"""Batched Franka Panda inverse kinematics in JAX.

The reference calls robofin's analytic (IKFast-style, native C) solver 100
times per scene from Python (``datasets/load_test_dataset.py:176-187``).  Here
the whole seed sweep is one vectorised device computation:

  * :func:`analytic_ik` — closed-form geometric solution for a given free
    wrist angle q7, derived from the DH table (8 candidate branches:
    2 elbow x 2 wrist x 2 shoulder), validated by an FK residual check and
    joint limits.  Fully vmap-able over targets and q7 seeds.
  * :func:`ik_goal_sweep` — the EDMP goal-candidate generator: q7 seeds
    (uniform + linspace over +-2.8973, load_test_dataset.py:176) -> padded
    (K, 7) candidate array + validity mask for the trust-region goal filter.
  * :func:`numerical_ik` — damped-least-squares refinement/cross-check using
    ``jax.jacfwd`` of the FK chain (used in tests to validate the analytic
    branches and available as a fallback).

Geometry note: frame origins/axes below follow the Craig-convention DH chain
of lib/guide.py:29-38; the target pose is the 10-frame 'right_gripper' frame
(flange + 45deg + TCP offset, lib/guide.py:100-116).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from edmp_tpu import constants as C
from edmp_tpu.robot import kinematics as kin

# numpy (not device) constants — see kinematics.py note
_LOWER = np.asarray(C.FRANKA_LOWER, np.float32)
_UPPER = np.asarray(C.FRANKA_UPPER, np.float32)

# segment constants from the DH table
_D1 = 0.333          # base -> shoulder height
_D3 = 0.316          # shoulder -> elbow offset
_A4 = 0.0825         # elbow kink
_D5 = 0.384          # elbow -> wrist offset
_A7 = 0.088          # wrist kink
_TCP = 0.107 + 0.1034  # flange + gripper TCP along z7


def _rz(q):
    c, s = jnp.cos(q), jnp.sin(q)
    z = jnp.zeros_like(q)
    o = jnp.ones_like(q)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1)], -2)


def _dh_R(alpha, q):
    """Rotation block of the Craig DH step (lib/guide.py:55-67)."""
    ca, sa = np.cos(alpha), np.sin(alpha)
    c, s = jnp.cos(q), jnp.sin(q)
    z = jnp.zeros_like(q)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s * ca, c * ca, -sa + z], -1),
        jnp.stack([s * sa, c * sa, ca + z], -1)], -2)


def analytic_ik(target: jnp.ndarray, q7: jnp.ndarray):
    """Closed-form IK for one 'right_gripper' target pose and one q7.

    Parameters
    ----------
    target : (4, 4) desired EE transform (kin.ee_transform convention).
    q7 : () free wrist angle.

    Returns
    -------
    solutions : (8, 7) candidate joint configurations
    valid : (8,) bool — within joint limits AND FK residual < 1e-3.

    The small-matrix algebra runs at HIGHEST matmul precision: on TPU the
    default bf16 MXU passes push FK residuals past the 1e-3 gate, silently
    invalidating EVERY branch (found in the round-3 protocol run).
    """
    with jax.default_matmul_precision("highest"):
        return _analytic_ik_impl(target, q7)


def _analytic_ik_impl(target, q7):
    R_ee = target[:3, :3]
    p_ee = target[:3, 3]

    # frame 7: undo TCP offset and the -45deg wrist rotation
    # (T_ee = T7 . Dz(0.107) . Rz(-pi/4) . Dz(0.1034))
    R7 = R_ee @ _rz(jnp.asarray(np.pi / 4))
    O7 = p_ee - _TCP * R_ee[:, 2]

    # frame 6 from q7: T6 = T7 . inv(A7(q7)),  A7 = (a=0.088, alpha=pi/2)
    A7R = _dh_R(np.pi / 2, q7)
    R6 = R7 @ A7R.T
    O6 = O7 + R7 @ (A7R.T @ jnp.asarray([-_A7, 0.0, 0.0]))

    O2 = jnp.asarray([0.0, 0.0, _D1])
    v = R6.T @ (O2 - O6)  # shoulder position in frame-6 coordinates
    D2 = jnp.sum(v * v)

    # elbow: D^2 = K0 + K1 cos q4 + K2 sin q4
    K0 = _D3**2 + _D5**2 + 2 * _A4**2
    K1 = 2 * (_D3 * _D5 - _A4**2)
    K2 = -2 * _A4 * (_D3 + _D5)
    Rk = np.sqrt(K1**2 + K2**2)
    phi0 = np.arctan2(K2, K1)
    x = jnp.clip((D2 - K0) / Rk, -1.0, 1.0)
    reachable = jnp.abs((D2 - K0) / Rk) <= 1.0
    dq4 = jnp.arccos(x)

    sols = []
    valids = []
    for elbow_sign in (-1.0, 1.0):
        q4 = phi0 + elbow_sign * dq4
        c4, s4 = jnp.cos(q4), jnp.sin(q4)
        a = _A4 * (1.0 - c4) - _D3 * s4      # = u1 + a4
        b = _A4 * s4 - _D3 * c4 - _D5        # z-comp in frame 5
        ww2 = v[0] ** 2 + v[1] ** 2 - b**2
        w_ok = ww2 >= 0.0
        wmag = jnp.sqrt(jnp.maximum(ww2, 0.0))
        for wrist_sign in (-1.0, 1.0):
            w = wrist_sign * wmag            # = a cos q5
            den = jnp.maximum(w**2 + b**2, 1e-12)
            c6 = (w * v[0] + b * v[1]) / den
            s6 = (b * v[0] - w * v[1]) / den
            q6 = jnp.arctan2(s6, c6)
            q5 = jnp.arctan2(v[2] * a, w * a)

            # back out frame 3, then the spherical shoulder:
            # R3 = Rz(q1) A2R(q2) A3R(q3), whose third column is
            # (c1 s2, s1 s2, c2) — two (q1, q2) branches.
            A6R = _dh_R(np.pi / 2, q6)
            A5R = _dh_R(-np.pi / 2, q5)
            A4R = _dh_R(np.pi / 2, q4)
            R3 = R6 @ A6R.T @ A5R.T @ A4R.T
            col = R3[:, 2]
            for shoulder_sign in (1.0, -1.0):
                s2 = shoulder_sign * jnp.sqrt(
                    jnp.maximum(col[0] ** 2 + col[1] ** 2, 1e-18))
                q2 = jnp.arctan2(s2, col[2])
                q1 = jnp.arctan2(col[1] * shoulder_sign,
                                 col[0] * shoulder_sign)
                # q3 from M = A2R^T Rz(-q1) R3  ->  A3R(q3)
                A2R = _dh_R(-np.pi / 2, q2)
                M = A2R.T @ _rz(-q1) @ R3
                q3 = jnp.arctan2(M[2, 0], M[0, 0])
                q = jnp.stack([q1, q2, q3, q4, q5, q6, q7])
                sols.append(q)
                valids.append(reachable & w_ok)

    solutions = jnp.stack(sols)
    valid = jnp.stack(valids)

    in_limits = jnp.all((solutions >= _LOWER) & (solutions <= _UPPER), axis=-1)
    T = kin.ee_transform(solutions)
    pos_err = jnp.linalg.norm(T[:, :3, 3] - p_ee, axis=-1)
    rot_err = jnp.linalg.norm(
        (T[:, :3, :3] - R_ee).reshape(solutions.shape[0], -1), axis=-1)
    ok = valid & in_limits & (pos_err < 1e-3) & (rot_err < 1e-2)
    return solutions, ok


analytic_ik_batch = jax.vmap(analytic_ik, in_axes=(None, 0))


def ik_goal_sweep(target, q7_seeds=None, *, rng=None):
    """EDMP goal-candidate generation: analytic IK over a q7 seed sweep.

    Returns (goals (K, 7), valid (K,)) with K = n_seeds * 8, padded by the
    validity mask.  Seed layout matches load_test_dataset.py:176: 50 uniform
    random + 50 linspace over [-2.8973, 2.8973].

    Divergence note: the reference keeps ik_solutions[0] per seed (all
    solutions for the first successful seed only).  We keep every valid
    branch — a strict superset; the trust-region + closest-to-start filter
    then picks the goal.  See tests for the distributional comparison.
    """
    if q7_seeds is None:
        if rng is None:
            rng = np.random.default_rng()
        q7_seeds = np.concatenate([
            rng.uniform(-C.Q7_RANGE, C.Q7_RANGE, 50),
            np.linspace(-C.Q7_RANGE, C.Q7_RANGE, 50),
        ])
    q7_seeds = jnp.asarray(q7_seeds, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    sols, ok = analytic_ik_batch(target, q7_seeds)
    K = sols.shape[0] * sols.shape[1]
    return sols.reshape(K, 7), ok.reshape(K)


def numerical_ik(target, q_init, iters: int = 64, damping: float = 1e-3):
    """Damped least-squares IK from a seed configuration (cross-check tool
    and analytic-dropout fallback).

    Minimises position error + orientation (rotation-vector) error of the
    10-frame EE transform.  Returns (q, err) with
    ``err = ||dp|| + 0.1 * orientation_angle_rad`` — the orientation term is
    the TRUE geodesic angle, not the small-angle skew residual (which
    vanishes at a 180-degree wrist flip and once let flipped fallback goals
    through a position-only gate).
    """
    target = jnp.asarray(target, jnp.float32)
    with jax.default_matmul_precision("highest"):
        return _numerical_ik_impl(target, q_init, iters, damping)


def _numerical_ik_impl(target, q_init, iters, damping):
    def residual(q):
        T = kin.ee_transform(q)
        dp = T[:3, 3] - target[:3, 3]
        dR = T[:3, :3] @ target[:3, :3].T
        # rotation vector from skew part (small-angle form is fine near sol)
        w = jnp.stack([dR[2, 1] - dR[1, 2], dR[0, 2] - dR[2, 0],
                       dR[1, 0] - dR[0, 1]]) * 0.5
        return jnp.concatenate([dp, w])

    jac = jax.jacfwd(residual)

    def body(_, q):
        r = residual(q)
        J = jac(q)
        JT = J.T
        dq = JT @ jnp.linalg.solve(J @ JT + damping * jnp.eye(6), r)
        return jnp.clip(q - dq, _LOWER, _UPPER)

    q = jax.lax.fori_loop(0, iters, body, jnp.asarray(q_init, jnp.float32))
    T = kin.ee_transform(q)
    pos_err = jnp.linalg.norm(T[:3, 3] - target[:3, 3])
    dR = T[:3, :3] @ target[:3, :3].T
    ang = jnp.arccos(jnp.clip((jnp.trace(dR) - 1.0) / 2.0, -1.0, 1.0))
    return q, pos_err + 0.1 * ang
