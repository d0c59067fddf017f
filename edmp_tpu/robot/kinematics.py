"""Batched Franka Panda forward kinematics in JAX.

TPU-first design notes
----------------------
The reference computes FK as a chain of dense 4x4 matmuls with the rotation
matrices materialised from a DH table (``lib/guide.py:45-98``).  Here the chain
is a short unrolled composition of ``(R, p)`` pairs (rotation 3x3 + position 3)
so XLA sees pure fused element-wise math + tiny contractions; everything is
batched over arbitrary leading dimensions (samples x waypoints) and is
differentiable with ``jax.grad``.

World-space link boxes are returned as (center, |R|·half_extent) so the AABB
of an oriented box is computed with one abs-matmul instead of materialising
the 8 corners the reference uses (``lib/guide.py:370-378``) — algebraically
identical: max over corners of R·(±h) + p equals p + |R|h.

Parity anchors: DH chain semantics lib/guide.py:74-98; 10-frame EE transform
lib/guide.py:100-116; joint->box static frames lib/guide.py:286-342.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from edmp_tpu import constants as C

# Static single-precision device constants (closed over by jitted fns).
# numpy module constants: creating DEVICE arrays at import would
# initialize the XLA backend and break jax.distributed.initialize in
# multi-host entry points; numpy operands constant-fold identically
_DH = np.asarray(C.DH_PARAMS, dtype=np.float32)
_STATIC_FRAMES = np.asarray(C.LINK_STATIC_FRAMES, dtype=np.float32)
_LINK_HALF = np.asarray(C.LINK_BOX_DIMS / 2.0, dtype=np.float32)


def _dh_rot_trans(a, d, alpha, q):
    """Rotation (3x3) and translation (3,) of one modified-DH step.

    ``q`` may have any batch shape; a/d/alpha are scalars.  Matches the matrix
    layout of lib/guide.py:45-72.
    """
    cq, sq = jnp.cos(q), jnp.sin(q)
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    zeros = jnp.zeros_like(cq)
    ones = jnp.ones_like(cq)
    R = jnp.stack(
        [
            jnp.stack([cq, -sq, zeros], axis=-1),
            jnp.stack([sq * ca, cq * ca, -sa * ones], axis=-1),
            jnp.stack([sq * sa, cq * sa, ca * ones], axis=-1),
        ],
        axis=-2,
    )
    p = jnp.stack([a * ones, -sa * d * ones, ca * d * ones], axis=-1)
    return R, p


# All kinematics contractions are tiny 3x3/3-vector products, but on TPU a
# default-precision einsum runs as a bf16 MXU pass — enough error (~1e-3 in
# positions) to break the analytic-IK FK-residual gate and the oracle's
# geometry.  HIGHEST forces f32 accumulation at negligible cost (these ops
# are a rounding error next to the UNet convs).
_PREC = jax.lax.Precision.HIGHEST


def _compose(Ra, pa, Rb, pb):
    """(Ra,pa) . (Rb,pb): world transform composition."""
    R = jnp.einsum("...ij,...jk->...ik", Ra, Rb, precision=_PREC)
    p = pa + jnp.einsum("...ij,...j->...i", Ra, pb, precision=_PREC)
    return R, p


def joint_frames(joints):
    """World transforms of the 9 collision-frame anchors.

    Parameters
    ----------
    joints : (..., 7) joint angles.

    Returns
    -------
    R : (..., 9, 3, 3), p : (..., 9, 3)
        Frames for joints 1..7; frames 7 and 8 (hand, finger) repeat the
        joint-7 frame (lib/guide.py:93-96).
    """
    joints = jnp.asarray(joints)
    batch = joints.shape[:-1]
    R = jnp.broadcast_to(jnp.eye(3, dtype=joints.dtype), batch + (3, 3))
    p = jnp.zeros(batch + (3,), dtype=joints.dtype)
    Rs, ps = [], []
    for i in range(C.NUM_JOINTS):
        a, d, alpha, off = (float(C.DH_PARAMS[i, k]) for k in range(4))
        Ri, pi = _dh_rot_trans(a, d, alpha, joints[..., i] + off)
        R, p = _compose(R, p, Ri, pi)
        Rs.append(R)
        ps.append(p)
    # hand + finger share the joint-7 frame
    Rs += [R, R]
    ps += [p, p]
    return jnp.stack(Rs, axis=-3), jnp.stack(ps, axis=-2)


def ee_transform(joints):
    """10-frame end-effector ('right_gripper') transform, (...,4,4).

    Chains all 10 DH rows (flange, -45deg wrist, TCP offset) like
    lib/guide.py:100-116.
    """
    joints = jnp.asarray(joints)
    batch = joints.shape[:-1]
    R = jnp.broadcast_to(jnp.eye(3, dtype=joints.dtype), batch + (3, 3))
    p = jnp.zeros(batch + (3,), dtype=joints.dtype)
    for i in range(C.NUM_DH_FRAMES):
        a, d, alpha, off = (float(C.DH_PARAMS[i, k]) for k in range(4))
        q = joints[..., i] + off if i < C.NUM_JOINTS else jnp.full(batch, off, joints.dtype)
        Ri, pi = _dh_rot_trans(a, d, alpha, q)
        R, p = _compose(R, p, Ri, pi)
    T = jnp.zeros(batch + (4, 4), dtype=joints.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(p)
    T = T.at[..., 3, 3].set(1.0)
    return T


def link_box_frames(joints):
    """World transforms of the 9 link collision boxes.

    Returns (R, p) with R (..., 9, 3, 3) and p (..., 9, 3): joint frames
    composed with the vendored static joint->box transforms
    (lib/guide.py:344-352).
    """
    Rj, pj = joint_frames(joints)
    Rs = _STATIC_FRAMES[:, :3, :3].astype(joints.dtype)
    ps = _STATIC_FRAMES[:, :3, 3].astype(joints.dtype)
    R = jnp.einsum("...lij,ljk->...lik", Rj, Rs, precision=_PREC)
    p = pj + jnp.einsum("...lij,lj->...li", Rj, ps, precision=_PREC)
    return R, p


def link_aabbs(joints, half_dims=None):
    """World-space AABBs of the 9 link boxes.

    Returns (lo, hi), each (..., 9, 3).  Equivalent to the reference's
    min/max over the 8 transformed box corners (lib/guide.py:370-378):
    AABB half-extent of an oriented box = |R| @ half_dims.
    """
    if half_dims is None:
        half_dims = _LINK_HALF
    R, p = link_box_frames(joints)
    ext = jnp.einsum("...lij,lj->...li", jnp.abs(R),
                     half_dims.astype(joints.dtype), precision=_PREC)
    return p - ext, p + ext


def fk_positions(joints):
    """Convenience: world positions of the 9 link-box centers, (..., 9, 3)."""
    _, p = link_box_frames(joints)
    return p


def numpy_link_box_frames(joints: np.ndarray):
    """Pure-numpy twin of :func:`link_box_frames`, batched over leading dims.

    (..., 7) -> (R (..., 9, 3, 3), p (..., 9, 3)), float64.  Host-side scene
    generators and validators MUST use this instead of the JAX version: on a
    remote (tunneled) backend every eager jnp op in a host loop is a remote
    dispatch, which made the round-5 corpus generator ~50x slower than the
    math itself.
    """
    joints = np.asarray(joints, np.float64)
    batch = joints.shape[:-1]
    R = np.broadcast_to(np.eye(3), batch + (3, 3)).copy()
    p = np.zeros(batch + (3,))
    Rs, ps = [], []
    for i in range(C.NUM_JOINTS):
        a, d, alpha, off = C.DH_PARAMS[i]
        q = joints[..., i] + off
        ca, sa, cq, sq = np.cos(alpha), np.sin(alpha), np.cos(q), np.sin(q)
        zeros, ones = np.zeros_like(cq), np.ones_like(cq)
        Ri = np.stack([
            np.stack([cq, -sq, zeros], axis=-1),
            np.stack([sq * ca, cq * ca, -sa * ones], axis=-1),
            np.stack([sq * sa, cq * sa, ca * ones], axis=-1),
        ], axis=-2)
        pi = np.stack([a * ones, -sa * d * ones, ca * d * ones], axis=-1)
        p = p + np.einsum("...ij,...j->...i", R, pi)
        R = np.einsum("...ij,...jk->...ik", R, Ri)
        Rs.append(R)
        ps.append(p)
    Rs += [R, R]  # hand + finger share the joint-7 frame
    ps += [p, p]
    Rj = np.stack(Rs, axis=-3)
    pj = np.stack(ps, axis=-2)
    Fs = np.asarray(C.LINK_STATIC_FRAMES, np.float64)
    Rb = np.einsum("...lij,ljk->...lik", Rj, Fs[:, :3, :3])
    pb = pj + np.einsum("...lij,lj->...li", Rj, Fs[:, :3, 3])
    return Rb, pb


def numpy_ee_transform(joints: np.ndarray) -> np.ndarray:
    """Float64 numpy reference FK (single config) for golden-value tests.

    Mirrors the independent numpy DH chain in lib/environment.py:347-419.
    """
    T = np.eye(4)
    for i in range(C.NUM_DH_FRAMES):
        a, d, alpha, off = C.DH_PARAMS[i]
        q = joints[i] + off if i < C.NUM_JOINTS else off
        ca, sa, cq, sq = np.cos(alpha), np.sin(alpha), np.cos(q), np.sin(q)
        Ti = np.array(
            [
                [cq, -sq, 0.0, a],
                [sq * ca, cq * ca, -sa, -sa * d],
                [sq * sa, cq * sa, ca, ca * d],
                [0.0, 0.0, 0.0, 1.0],
            ]
        )
        T = T @ Ti
    return T
