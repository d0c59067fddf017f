"""Lane-major guidance cost engine (TPU layout-optimised).

The readable engine (:mod:`edmp_tpu.costs.guide`) carries geometry in
(..., 3) / (..., 3, 3) trailing dims — on TPU every elementwise op then runs
on (8, 128) tiles that are ~3% occupied.  This module computes the SAME math
in scalar-of-arrays form: every quantity is an array shaped (W, B) or
(O, W, B) with the big batch axis LAST (lanes) and waypoints on sublanes;
the 3-vectors, 3x3 rotations and 9 links are unrolled in Python, with the
DH constants folded into the FMA chains.

Numerically identical to guide.blended_cost / guidance_gradient (see
tests/test_fast_guide.py for elementwise equivalence); used by the sampler's
guidance step.  Differentiated with jax.grad — the unrolled graph is bigger
to compile but every op runs at full lane occupancy.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from edmp_tpu import constants as C

# Per-joint DH constants (a, d, cos/sin alpha), folded at trace time.
_DH = C.DH_PARAMS
# static link frames: rotation (3x3) and translation (3,) per link
_LR = C.LINK_STATIC_FRAMES[:, :3, :3]
_LT = C.LINK_STATIC_FRAMES[:, :3, 3]
_LH = C.LINK_BOX_DIMS / 2.0
_LJ = C.LINK_JOINT_FRAME  # 1-based joint index per link


def _fk_lane_major(q):
    """q: list of 7 arrays (W, B) -> per-joint (R, p) as nested lists.

    R[j] is a 3x3 nested list of (W, B) arrays, p[j] a 3-list; joints
    1..7 only (the 9 boxes ride on these frames).  Same chain as
    kinematics.joint_frames (lib/guide.py:74-98) with constants folded.
    """
    W_B = q[0].shape
    one = jnp.ones(W_B, q[0].dtype)
    zero = jnp.zeros(W_B, q[0].dtype)
    R = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]
    p = [zero, zero, zero]
    Rs, ps = [], []
    for j in range(7):
        a, d, alpha, off = (float(_DH[j, k]) for k in range(4))
        ca, sa = float(np.cos(alpha)), float(np.sin(alpha))
        cq = jnp.cos(q[j] + off) if off else jnp.cos(q[j])
        sq = jnp.sin(q[j] + off) if off else jnp.sin(q[j])
        # DH step columns (Craig convention, lib/guide.py:55-67):
        #   col0 = (cq, sq*ca, sq*sa), col1 = (-sq, cq*ca, cq*sa),
        #   col2 = (0, -sa, ca),       trans = (a, -sa*d, ca*d)
        Rn = [[None] * 3 for _ in range(3)]
        pn = [None] * 3
        for i in range(3):
            r0, r1, r2 = R[i]
            Rn[i][0] = r0 * cq + (r1 * ca + r2 * sa) * sq
            Rn[i][1] = -r0 * sq + (r1 * ca + r2 * sa) * cq
            Rn[i][2] = -r1 * sa + r2 * ca
            pn[i] = p[i] + r0 * a + (-r1 * sa + r2 * ca) * d
        R, p = Rn, pn
        Rs.append(R)
        ps.append(p)
    return Rs, ps


def _link_aabbs_lane_major(Rs, ps):
    """-> per-link (lo, hi): lists of 3 arrays (W, B) each."""
    los, his = [], []
    for l in range(9):
        j = int(_LJ[l]) - 1
        R, p = Rs[j], ps[j]
        A = _LR[l]
        t = _LT[l]
        h = _LH[l]
        lo_l, hi_l = [], []
        for i in range(3):
            # world-frame row i of the box rotation: Rw[i][k] = sum_m R[i][m] A[m][k]
            rw = [R[i][0] * float(A[0, k]) + R[i][1] * float(A[1, k])
                  + R[i][2] * float(A[2, k]) for k in range(3)]
            c = p[i] + R[i][0] * float(t[0]) + R[i][1] * float(t[1]) \
                + R[i][2] * float(t[2])
            ext = (jnp.abs(rw[0]) * float(h[0]) + jnp.abs(rw[1]) * float(h[1])
                   + jnp.abs(rw[2]) * float(h[2]))
            lo_l.append(c - ext)
            hi_l.append(c + ext)
        los.append(lo_l)
        his.append(hi_l)
    return los, his


def blended_cost_fast(joints, start, goal, obs_lo, obs_hi, guidance_method):
    """Lane-major equivalent of guide.blended_cost.

    joints : (B, N, 7) interior waypoints (differentiated argument)
    start/goal : (7,) or (B, 7); obs_lo/hi : (B, O, 3); method : (B,)
    """
    B, N, _ = joints.shape
    startb = jnp.broadcast_to(start, (B, 7))
    goalb = jnp.broadcast_to(goal, (B, 7))
    # (B, W, 7) -> per-joint (W, B) lane-major arrays
    traj = jnp.concatenate([startb[:, None, :], joints, goalb[:, None, :]],
                           axis=1)
    W = N + 2
    qT = jnp.transpose(traj, (2, 1, 0))  # (7, W, B)
    q = [qT[j] for j in range(7)]

    Rs, ps = _fk_lane_major(q)
    los, his = _link_aabbs_lane_major(Rs, ps)

    # obstacles -> (O, 3, B), broadcast over waypoints
    oloT = jnp.transpose(obs_lo, (1, 2, 0))  # (O, 3, B)
    ohiT = jnp.transpose(obs_hi, (1, 2, 0))
    O = oloT.shape[0]

    m = guidance_method  # (B,)
    iv_w = (1.0 - m)[None, None, :]  # weight over (O?, W-2, B) broadcast
    sv_w = m[None, None, :]

    total = jnp.zeros((), joints.dtype)
    for l in range(9):
        lo_l, hi_l = los[l], his[l]
        # intersection volumes on interior waypoints (lib/guide.py:354-395)
        iv = None
        sv = None
        for which in ("iv", "sv"):
            terms = []
            for k in range(3):
                if which == "iv":
                    a_lo = lo_l[k][None, 1:-1, :]          # (1, N, B)
                    a_hi = hi_l[k][None, 1:-1, :]
                else:
                    a_lo = jnp.minimum(lo_l[k][:-1], lo_l[k][1:])[None]
                    a_hi = jnp.maximum(hi_l[k][:-1], hi_l[k][1:])[None]
                o_lo = oloT[:, k, None, :]                  # (O, 1, B)
                o_hi = ohiT[:, k, None, :]
                ov = (jnp.minimum(a_hi, o_hi) - jnp.maximum(a_lo, o_lo))
                terms.append(jnp.clip(ov, min=0.0))
            vol = terms[0] * terms[1] * terms[2]            # (O, *, B)
            if which == "iv":
                iv = vol
            else:
                sv = vol
        total = total + jnp.sum(iv * iv_w) + jnp.sum(sv * sv_w)
    return total


def guidance_gradient_fast(joints, start, goal, obs_lo, obs_hi, guide):
    """Drop-in replacement for guide.guidance_gradient (same semantics,
    incl. whole-tensor grad normalisation, lib/guide.py:627-629)."""
    g = jax.grad(blended_cost_fast)(joints, start, goal, obs_lo, obs_hi,
                                    guide.guidance_method)
    # zero-gradient guard: a scene the batch never touches gives ||g|| = 0
    # and g/0 = NaN would poison ALL samples through 0*NaN (the reference
    # NaNs only its grad_norm rows there, lib/guide.py:627-629 — equally
    # useless; g = 0 is the only sensible value either way)
    norm = jnp.maximum(jnp.linalg.norm(g.reshape(-1)), 1e-30)
    gn = guide.grad_norm[:, None, None]
    return (1.0 - gn) * g + gn * (g / norm)
