"""Hand-derived guidance gradient (no autodiff), lane-major.

The sampler needs ONLY the gradient of the blended collision cost — never its
value (diffusion.py:330-341).  This module computes that gradient in closed
form: FK forward with stored per-joint frames, analytic overlap-volume
derivatives routed through the min/max/clamp chain, and a reverse sweep over
the 7-joint compose chain.  Compared to ``jax.grad`` of
:mod:`edmp_tpu.costs.fast_guide` it evaluates exactly the required adjoints
and nothing else, in the same batch-last layout; it is also the blueprint for
the Pallas kernel (same dataflow, VMEM-resident intermediates).

Validated elementwise against the autodiff engines in
tests/test_grad_kernel.py.

Notation (per lane = one (waypoint, sample) pair):
  R[j], p[j]     world rotation/translation of joint frame j (j = 0..6)
  A_l, t_l, h_l  static link-box rotation / offset / half extents
  lo/hi          world AABB of a link box;  c = center, e = |Rw| h
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from edmp_tpu import constants as C

_DH = C.DH_PARAMS
_LR = C.LINK_STATIC_FRAMES[:, :3, :3]
_LT = C.LINK_STATIC_FRAMES[:, :3, 3]
_LH = C.LINK_BOX_DIMS / 2.0
_LJ = C.LINK_JOINT_FRAME


def _fk_forward(q):
    """q: 7-list of (W, B) -> (Rs, ps): per-joint nested component lists."""
    shape = q[0].shape
    one = jnp.ones(shape, q[0].dtype)
    zero = jnp.zeros(shape, q[0].dtype)
    R = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]
    p = [zero, zero, zero]
    Rs, ps, trig = [], [], []
    for j in range(7):
        a, d, alpha, off = (float(_DH[j, k]) for k in range(4))
        ca, sa = float(np.cos(alpha)), float(np.sin(alpha))
        cq = jnp.cos(q[j] + off) if off else jnp.cos(q[j])
        sq = jnp.sin(q[j] + off) if off else jnp.sin(q[j])
        Rn = [[None] * 3 for _ in range(3)]
        pn = [None] * 3
        for i in range(3):
            r0, r1, r2 = R[i]
            m = r1 * ca + r2 * sa
            Rn[i][0] = r0 * cq + m * sq
            Rn[i][1] = -r0 * sq + m * cq
            Rn[i][2] = -r1 * sa + r2 * ca
            pn[i] = p[i] + r0 * a + (-r1 * sa + r2 * ca) * d
        Rs.append(R)   # parent frame (R_{j-1}) stored for the backward pass
        ps.append(p)
        trig.append((cq, sq, ca, sa, a, d))
        R, p = Rn, pn
    Rs.append(R)  # Rs[j] = frame of joint j's PARENT; Rs[7] = frame 7
    ps.append(p)
    return Rs, ps, trig


def _joint_frame(Rs, ps, j):
    """World frame of joint j (1-based link anchor -> index j)."""
    return Rs[j], ps[j]


def manual_guidance_gradient(joints, start, goal, obs_lo, obs_hi,
                             guidance_method):
    """Closed-form gradient of guide.blended_cost w.r.t. the interior
    waypoints.  Same signature/semantics as fast_guide (minus grad_norm,
    which the caller applies)."""
    B, N, _ = joints.shape
    dtype = joints.dtype
    startb = jnp.broadcast_to(start, (B, 7))
    goalb = jnp.broadcast_to(goal, (B, 7))
    traj = jnp.concatenate([startb[:, None, :], joints, goalb[:, None, :]],
                           axis=1)
    W = N + 2
    qT = jnp.transpose(traj, (2, 1, 0))  # (7, W, B)
    q = [qT[j] for j in range(7)]

    Rs, ps, trig = _fk_forward(q)

    oloT = jnp.transpose(obs_lo, (1, 2, 0))  # (O, 3, B)
    ohiT = jnp.transpose(obs_hi, (1, 2, 0))
    O = oloT.shape[0]
    m = guidance_method
    w_iv = (1.0 - m)[None, :]  # (1, B) over (W, B) arrays
    w_sv = m[None, :]

    zero = jnp.zeros((W, B), dtype)
    # accumulated world-frame adjoints per joint frame
    dR = [[[zero, zero, zero], [zero, zero, zero], [zero, zero, zero]]
          for _ in range(7)]
    dp = [[zero, zero, zero] for _ in range(7)]
    interior = jnp.ones((W, 1), dtype).at[0, 0].set(0.0).at[-1, 0].set(0.0)

    for l in range(9):
        j = int(_LJ[l])  # joint frame index (1-based == Rs/ps index)
        R, p = _joint_frame(Rs, ps, j)
        A, t, h = _LR[l], _LT[l], _LH[l]

        # forward: world box rotation rows, center, extent
        rw = [[R[i][0] * float(A[0, k]) + R[i][1] * float(A[1, k])
               + R[i][2] * float(A[2, k]) for k in range(3)]
              for i in range(3)]
        c = [p[i] + R[i][0] * float(t[0]) + R[i][1] * float(t[1])
             + R[i][2] * float(t[2]) for i in range(3)]
        e = [jnp.abs(rw[i][0]) * float(h[0]) + jnp.abs(rw[i][1]) * float(h[1])
             + jnp.abs(rw[i][2]) * float(h[2]) for i in range(3)]
        lo = [c[i] - e[i] for i in range(3)]
        hi = [c[i] + e[i] for i in range(3)]

        # obstacles stay a VECTORIZED axis: all overlap quantities are
        # (O, W, B) and reduce over O — same dataflow as the forward cost,
        # ~O x fewer ops than unrolling obstacles in Python.
        olo = [oloT[:, k, :][:, None, :] for k in range(3)]  # (O, 1, B)
        ohi = [ohiT[:, k, :][:, None, :] for k in range(3)]

        # ---- intersection volumes on interior waypoints ----
        ck = []
        for k in range(3):
            tk = jnp.minimum(hi[k], ohi[k]) - jnp.maximum(lo[k], olo[k])
            ck.append(jnp.maximum(tk, 0.0))
        others = [ck[1] * ck[2], ck[0] * ck[2], ck[0] * ck[1]]
        dlo = [None] * 3
        dhi = [None] * 3
        for k in range(3):
            live = (ck[k] > 0.0).astype(dtype) * others[k] * w_iv
            ghi = jnp.sum(live * (hi[k] <= ohi[k]).astype(dtype), axis=0)
            glo = -jnp.sum(live * (lo[k] >= olo[k]).astype(dtype), axis=0)
            # interior only: endpoint rows carry no iv cost
            dhi[k] = ghi * interior
            dlo[k] = glo * interior

        # ---- swept volumes over consecutive-waypoint hulls ----
        slo = [jnp.minimum(lo[k][:-1], lo[k][1:]) for k in range(3)]
        shi = [jnp.maximum(hi[k][:-1], hi[k][1:]) for k in range(3)]
        sk = []
        for k in range(3):
            tk = jnp.minimum(shi[k], ohi[k]) - jnp.maximum(slo[k], olo[k])
            sk.append(jnp.maximum(tk, 0.0))
        sothers = [sk[1] * sk[2], sk[0] * sk[2], sk[0] * sk[1]]
        for k in range(3):
            live = (sk[k] > 0.0).astype(dtype) * sothers[k] * w_sv
            gshi = jnp.sum(live * (shi[k] <= ohi[k]).astype(dtype), axis=0)
            gslo = -jnp.sum(live * (slo[k] >= olo[k]).astype(dtype), axis=0)
            # route hull adjoints to the arg-extreme waypoint; ties give the
            # first (jnp.minimum grad convention: cotangent to x when x <= y)
            lo_first = (lo[k][:-1] <= lo[k][1:]).astype(dtype)
            hi_first = (hi[k][:-1] >= hi[k][1:]).astype(dtype)
            pad = jnp.zeros((1, B), dtype)
            dlo[k] = dlo[k] + jnp.concatenate([gslo * lo_first, pad], 0) \
                + jnp.concatenate([pad, gslo * (1 - lo_first)], 0)
            dhi[k] = dhi[k] + jnp.concatenate([gshi * hi_first, pad], 0) \
                + jnp.concatenate([pad, gshi * (1 - hi_first)], 0)

        # ---- AABB -> joint-frame adjoints ----
        # lo = c - e, hi = c + e  =>  dc = dlo + dhi, de = dhi - dlo
        for i in range(3):
            dci = dlo[i] + dhi[i]
            dei = dhi[i] - dlo[i]
            # c_i = p_i + sum_m R[i][m] t_m
            dp[j - 1][i] = dp[j - 1][i] + dci
            for mm in range(3):
                dR[j - 1][i][mm] = dR[j - 1][i][mm] + dci * float(t[mm])
            # e_i = sum_k |rw[i][k]| h_k ; rw[i][k] = sum_m R[i][m] A[m][k]
            for k in range(3):
                s = jnp.sign(rw[i][k]) * float(h[k]) * dei
                for mm in range(3):
                    dR[j - 1][i][mm] = dR[j - 1][i][mm] + s * float(A[mm, k])

    # ---- reverse sweep over the compose chain ----
    # T_j = T_{j-1} . A_j(q_j); hand/finger ride joint 7 (accumulated above
    # onto dR/dp[6] via _LJ).
    gq = [None] * 7
    for j in range(6, -1, -1):
        cq, sq, ca, sa, a, d = trig[j]
        Rprev, _ = Rs[j], ps[j]
        dRj, dpj = dR[j], dp[j]
        # dq: R_j depends on q via cq/sq:
        #   R_j[i][0] =  r0 cq + m sq ;  R_j[i][1] = -r0 sq + m cq
        # with r* = Rprev[i][*], m = r1 ca + r2 sa (translation is q-free)
        gqj = zero
        for i in range(3):
            r0, r1, r2 = Rprev[i]
            mm = r1 * ca + r2 * sa
            gqj = gqj + dRj[i][0] * (-r0 * sq + mm * cq) \
                + dRj[i][1] * (-r0 * cq - mm * sq)
        gq[j] = gqj
        if j > 0:
            # propagate to the parent frame:
            #   dRprev[i][0] += dR[i][0] cq - dR[i][1] sq  (+ dp_i * a)
            #   dRprev[i][1] += (dR[i][0] sq + dR[i][1] cq) ca - dR[i][2] sa
            #                   (+ dp_i * (-sa d))
            #   dRprev[i][2] += (dR[i][0] sq + dR[i][1] cq) sa + dR[i][2] ca
            #                   (+ dp_i * (ca d))
            dRp, dpp = dR[j - 1], dp[j - 1]
            for i in range(3):
                g0, g1, g2 = dRj[i]
                gp_i = dpj[i]
                gsum = g0 * sq + g1 * cq
                dRp[i][0] = dRp[i][0] + g0 * cq - g1 * sq + gp_i * a
                dRp[i][1] = dRp[i][1] + gsum * ca - g2 * sa + gp_i * (-sa * d)
                dRp[i][2] = dRp[i][2] + gsum * sa + g2 * ca + gp_i * (ca * d)
                dpp[i] = dpp[i] + gp_i

    g = jnp.stack(gq, axis=0)          # (7, W, B)
    g = jnp.transpose(g, (2, 1, 0))    # (B, W, 7)
    return g[:, 1:-1, :]               # interior waypoints only


def guidance_gradient_manual(joints, start, goal, obs_lo, obs_hi, guide):
    """Drop-in guidance gradient with the reference's whole-tensor norm
    option (lib/guide.py:627-629)."""
    g = manual_guidance_gradient(joints, start, goal, obs_lo, obs_hi,
                                 guide.guidance_method)
    norm = jnp.linalg.norm(g.reshape(-1))
    gn = guide.grad_norm[:, None, None]
    return (1.0 - gn) * g + gn * (g / norm)
