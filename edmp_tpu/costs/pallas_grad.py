"""Fused Pallas TPU kernel for the guidance gradient (SURVEY §7 item 3's
#1 Pallas candidate: FK -> AABB -> overlap -> adjoint -> reverse-compose in
ONE kernel with all intermediates VMEM-resident).

The lane-major dataflow is shared with the XLA engine
(:func:`edmp_tpu.costs.grad_kernel.lane_major_guidance_grad`): one lane = one
(waypoint, sample) pair, samples on the 128-lane axis, waypoints on sublanes.
The Pallas win over the XLA fusion is locality: the ~150 elementwise
planes the chain produces per link (frames, extents, overlap terms, adjoint
accumulators) never round-trip to HBM — each 128-sample block streams q and
the obstacle AABBs in, keeps the whole FK+adjoint state in VMEM, and writes
only the (7, W) gradient planes back.

Reference counterpart: lib/guide.py:597-635 (autograd through the cost).
Elementwise parity vs the XLA engines: tests/test_pallas_grad.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edmp_tpu.costs.grad_kernel import lane_major_guidance_grad

LANE_BLOCK = 128


def _kernel(q_ref, olo_ref, ohi_ref, w_ref, out_ref):
    """One 128-lane block: full gradient chain in VMEM.

    q_ref (7, W, LB) | olo/ohi_ref (3, O, LB) | w_ref (2, LB) ->
    out_ref (7, W, LB).
    """
    q = [q_ref[j] for j in range(7)]
    olo = [olo_ref[k] for k in range(3)]
    ohi = [ohi_ref[k] for k in range(3)]
    w_iv = w_ref[0:1, :]  # (1, LB)
    w_sv = w_ref[1:2, :]
    gq = lane_major_guidance_grad(q, olo, ohi, w_iv, w_sv)
    for j in range(7):
        out_ref[j] = gq[j]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_guidance_gradient(joints, start, goal, obs_lo, obs_hi,
                             guidance_method, interpret: bool = False):
    """Gradient of the blended collision cost w.r.t. interior waypoints.

    Same contract as grad_kernel.manual_guidance_gradient: joints (B, N, 7)
    joint-limit-clipped interior waypoints, obs_lo/hi (B, O, 3) per-sample
    obstacle AABBs, guidance_method (B,) in {0=iv, 1=sv}.  Returns (B, N, 7).
    """
    B, N, _ = joints.shape
    W = N + 2
    joints = joints.astype(jnp.float32)
    startb = jnp.broadcast_to(start, (B, 7)).astype(jnp.float32)
    goalb = jnp.broadcast_to(goal, (B, 7)).astype(jnp.float32)
    traj = jnp.concatenate([startb[:, None, :], joints, goalb[:, None, :]],
                           axis=1)
    qT = jnp.transpose(traj, (2, 1, 0))                       # (7, W, B)
    oloT = jnp.transpose(obs_lo, (2, 1, 0)).astype(jnp.float32)  # (3, O, B)
    ohiT = jnp.transpose(obs_hi, (2, 1, 0)).astype(jnp.float32)
    m = guidance_method.astype(jnp.float32)
    w = jnp.stack([1.0 - m, m], axis=0)                       # (2, B)

    O = oloT.shape[1]
    Bp = -(-B // LANE_BLOCK) * LANE_BLOCK
    pad = Bp - B
    if pad:
        qT = jnp.pad(qT, ((0, 0), (0, 0), (0, pad)))
        oloT = jnp.pad(oloT, ((0, 0), (0, 0), (0, pad)))
        ohiT = jnp.pad(ohiT, ((0, 0), (0, 0), (0, pad)))
        w = jnp.pad(w, ((0, 0), (0, pad)))

    grid = (Bp // LANE_BLOCK,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((7, W, LANE_BLOCK), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, O, LANE_BLOCK), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, O, LANE_BLOCK), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LANE_BLOCK), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((7, W, LANE_BLOCK), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((7, W, Bp), jnp.float32),
        interpret=interpret,
    )(qT, oloT, ohiT, w)

    g = jnp.transpose(out, (2, 1, 0))  # (Bp, W, 7)
    return g[:B, 1:-1, :]


def guidance_gradient_pallas(joints, start, goal, obs_lo, obs_hi, guide,
                             interpret: bool | None = None):
    """Drop-in guidance gradient (sampler engine slot) with the reference's
    whole-tensor grad-norm option (lib/guide.py:627-629).

    ``interpret=None`` auto-selects: compiled on TPU, interpreter elsewhere
    (the Mosaic kernel only targets TPU; CPU runs/tests stay correct).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    g = pallas_guidance_gradient(joints, start, goal, obs_lo, obs_hi,
                                 guide.guidance_method, interpret=interpret)
    # zero-gradient guard (see fast_guide.guidance_gradient_fast)
    norm = jnp.maximum(jnp.linalg.norm(g.reshape(-1)), 1e-30)
    gn = guide.grad_norm[:, None, None]
    return (1.0 - gn) * g + gn * (g / norm)
