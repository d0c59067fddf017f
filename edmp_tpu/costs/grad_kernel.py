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

import jax
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


def lane_major_guidance_grad(q, olo, ohi, w_iv, w_sv):
    """The shared lane-major gradient core (XLA and Pallas engines).

    q : list of 7 (W, B) joint-angle planes (endpoints included)
    olo/ohi : lists of 3 (O, B) obstacle AABB coordinate planes
    w_iv/w_sv : (1, B) per-sample iv/sv blend weights
    Returns gq: list of 7 (W, B) gradient planes (endpoint rows carry sv
    adjoints the caller discards).

    Every op is elementwise/broadcast over (W, B) or (O, W, B) — inside a
    Pallas kernel all intermediates live in VMEM for one lane block.
    """
    W, B = q[0].shape
    dtype = q[0].dtype

    Rs, ps, trig = _fk_forward(q)

    zero = jnp.zeros((W, B), dtype)
    # accumulated world-frame adjoints per joint frame
    dR = [[[zero, zero, zero], [zero, zero, zero], [zero, zero, zero]]
          for _ in range(7)]
    dp = [[zero, zero, zero] for _ in range(7)]
    # interior-row mask without scatter (.at) so the same code lowers in
    # Pallas: rows 1..W-2 are 1, endpoint rows 0
    wi = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    interior = ((wi > 0) & (wi < W - 1)).astype(dtype)

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
        olo_e = [olo[k][:, None, :] for k in range(3)]  # (O, 1, B)
        ohi_e = [ohi[k][:, None, :] for k in range(3)]

        # ---- intersection volumes on interior waypoints ----
        ck = []
        for k in range(3):
            tk = jnp.minimum(hi[k], ohi_e[k]) - jnp.maximum(lo[k], olo_e[k])
            ck.append(jnp.maximum(tk, 0.0))
        others = [ck[1] * ck[2], ck[0] * ck[2], ck[0] * ck[1]]
        dlo = [None] * 3
        dhi = [None] * 3
        for k in range(3):
            live = (ck[k] > 0.0).astype(dtype) * others[k] * w_iv
            ghi = jnp.sum(live * (hi[k] <= ohi_e[k]).astype(dtype), axis=0)
            glo = -jnp.sum(live * (lo[k] >= olo_e[k]).astype(dtype), axis=0)
            # interior only: endpoint rows carry no iv cost
            dhi[k] = ghi * interior
            dlo[k] = glo * interior

        # ---- swept volumes over consecutive-waypoint hulls ----
        slo = [jnp.minimum(lo[k][:-1], lo[k][1:]) for k in range(3)]
        shi = [jnp.maximum(hi[k][:-1], hi[k][1:]) for k in range(3)]
        sk = []
        for k in range(3):
            tk = jnp.minimum(shi[k], ohi_e[k]) - jnp.maximum(slo[k], olo_e[k])
            sk.append(jnp.maximum(tk, 0.0))
        sothers = [sk[1] * sk[2], sk[0] * sk[2], sk[0] * sk[1]]
        for k in range(3):
            live = (sk[k] > 0.0).astype(dtype) * sothers[k] * w_sv
            gshi = jnp.sum(live * (shi[k] <= ohi_e[k]).astype(dtype), axis=0)
            gslo = -jnp.sum(live * (slo[k] >= olo_e[k]).astype(dtype), axis=0)
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

    return gq


def lane_major_swept_cost(q, olo, ohi):
    """Forward-only lane-major TOTAL swept volume per lane column.

    q : list of 7 (W, B) joint planes (endpoints INCLUDED); olo/ohi : lists
    of 3 (O, B) obstacle AABB planes.  Returns (B,).

    This is the selection metric (lib/guide.py:637-653) in the guidance
    kernel's layout: the round-4 device trace (results_r4/trace_ddim16)
    showed the naive ``(..., 3, 3)``-layout selection chain materialising
    ~50 MB of FK intermediates and costing ~2 ms/scene OUT of the sampler
    scan — 5% of a DDPM call but ~45% of the DDIM-16 fast mode.  The
    lane-major forward is the same dataflow the in-scan gradient runs at
    ~0.3 ms per step.
    """
    Rs, ps, _ = _fk_forward(q)
    total = 0.0
    for l in range(9):
        j = int(_LJ[l])
        R, p = _joint_frame(Rs, ps, j)
        A, t, h = _LR[l], _LT[l], _LH[l]
        rw = [[R[i][0] * float(A[0, k]) + R[i][1] * float(A[1, k])
               + R[i][2] * float(A[2, k]) for k in range(3)]
              for i in range(3)]
        c = [p[i] + R[i][0] * float(t[0]) + R[i][1] * float(t[1])
             + R[i][2] * float(t[2]) for i in range(3)]
        e = [jnp.abs(rw[i][0]) * float(h[0]) + jnp.abs(rw[i][1]) * float(h[1])
             + jnp.abs(rw[i][2]) * float(h[2]) for i in range(3)]
        vol = None
        for k in range(3):
            lo = c[k] - e[k]
            hi = c[k] + e[k]
            slo = jnp.minimum(lo[:-1], lo[1:])       # (W-1, B)
            shi = jnp.maximum(hi[:-1], hi[1:])
            ck = jnp.maximum(
                jnp.minimum(shi, ohi[k][:, None, :])
                - jnp.maximum(slo, olo[k][:, None, :]), 0.0)  # (O, W-1, B)
            vol = ck if vol is None else vol * ck
        total = total + jnp.sum(vol, axis=(0, 1))
    return total


def swept_cost_per_sample_fast(trajs, scene):
    """Selection metric on FULL trajectories (B, N, 7) -> (B,), lane-major.

    Equivalent to guide.swept_cost_per_sample(trajs[:, 1:-1], start, goal,
    scene) when trajs carry the pinned endpoints in rows 0/-1 (the sampler
    guarantees this) — verified elementwise in tests/test_grad_kernel.py.
    """
    from edmp_tpu.costs.obstacles import obstacle_aabbs

    obs_lo, obs_hi = obstacle_aabbs(scene)           # (B|1, O, 3)
    if obs_lo.ndim == 2:
        obs_lo, obs_hi = obs_lo[None], obs_hi[None]
    qT = jnp.transpose(trajs, (2, 1, 0))             # (7, W, B)
    oloT = jnp.transpose(obs_lo, (1, 2, 0))          # (O, 3, B|1)
    ohiT = jnp.transpose(obs_hi, (1, 2, 0))
    olo = [oloT[:, k, :] for k in range(3)]
    ohi = [ohiT[:, k, :] for k in range(3)]
    return lane_major_swept_cost([qT[j] for j in range(7)], olo, ohi)


def lane_major_obstacle_planes(centersT, absrotT, dimsT, expansion, clearance):
    """Per-step obstacle AABB planes from PRE-TRANSPOSED scene params.

    The scene geometry (centers, |R|, dims) is t-independent — only the
    scalar expansion/clearance schedules change per step — so the sampler
    hoists the (B, O, ...) -> lane-major transposes OUT of the scan and this
    per-step function is pure (O, B)-plane arithmetic (obstacles.py:88-111
    semantics: extents floored at ``expansion``, grown by ``clearance``).

    centersT/dimsT : lists of 3 (O, B); absrotT : 3x3 nested lists of (O, B);
    expansion/clearance : (B,).  Returns (olo, ohi): lists of 3 (O, B).
    """
    e = expansion[None, :]
    cl = clearance[None, :]
    # halve BEFORE the |R| products — the same float-op order as
    # obstacles.obstacle_aabbs' einsum(|R|, sizes*0.5), keeping this path
    # bit-identical to the reference-parity engine
    half = [(jnp.maximum(dimsT[k], e) + cl) * 0.5 for k in range(3)]
    olo, ohi = [], []
    for i in range(3):
        ext = (absrotT[i][0] * half[0] + absrotT[i][1] * half[1]
               + absrotT[i][2] * half[2])
        olo.append(centersT[i] - ext)
        ohi.append(centersT[i] + ext)
    return olo, ohi


def scene_to_lane_major(scene):
    """SceneObstacles -> pre-transposed plane lists for
    lane_major_obstacle_planes.  Per-sample scenes (B, O, ...) become (O, B)
    planes; shared scenes (O, ...) become (O, 1) planes that broadcast over
    the lane axis."""
    def plane(a):  # (B, O) or (O,)
        return jnp.transpose(a) if a.ndim == 2 else a[:, None]

    centersT = [plane(scene.centers[..., k]) for k in range(3)]
    dimsT = [plane(scene.dims[..., k]) for k in range(3)]
    absrotT = [[plane(scene.abs_rot[..., i, j]) for j in range(3)]
               for i in range(3)]
    return centersT, absrotT, dimsT


def manual_guidance_gradient(joints, start, goal, obs_lo, obs_hi,
                             guidance_method):
    """Closed-form gradient of guide.blended_cost w.r.t. the interior
    waypoints.  Same signature/semantics as fast_guide (minus grad_norm,
    which the caller applies).  XLA entry to the lane-major core."""
    B, N, _ = joints.shape
    startb = jnp.broadcast_to(start, (B, 7))
    goalb = jnp.broadcast_to(goal, (B, 7))
    traj = jnp.concatenate([startb[:, None, :], joints, goalb[:, None, :]],
                           axis=1)
    qT = jnp.transpose(traj, (2, 1, 0))  # (7, W, B)
    q = [qT[j] for j in range(7)]

    oloT = jnp.transpose(obs_lo, (1, 2, 0))  # (O, 3, B)
    ohiT = jnp.transpose(obs_hi, (1, 2, 0))
    olo = [oloT[:, k, :] for k in range(3)]
    ohi = [ohiT[:, k, :] for k in range(3)]
    m = guidance_method
    w_iv = (1.0 - m)[None, :]  # (1, B) over (W, B) arrays
    w_sv = m[None, :]

    gq = lane_major_guidance_grad(q, olo, ohi, w_iv, w_sv)
    g = jnp.stack(gq, axis=0)          # (7, W, B)
    g = jnp.transpose(g, (2, 1, 0))    # (B, W, 7)
    return g[:, 1:-1, :]               # interior waypoints only


def guidance_gradient_manual(joints, start, goal, obs_lo, obs_hi, guide):
    """Drop-in guidance gradient with the reference's whole-tensor norm
    option (lib/guide.py:627-629)."""
    g = manual_guidance_gradient(joints, start, goal, obs_lo, obs_hi,
                                 guide.guidance_method)
    # zero-gradient guard (see fast_guide.guidance_gradient_fast)
    norm = jnp.maximum(jnp.linalg.norm(g.reshape(-1)), 1e-30)
    gn = guide.grad_norm[:, None, None]
    return (1.0 - gn) * g + gn * (g / norm)
