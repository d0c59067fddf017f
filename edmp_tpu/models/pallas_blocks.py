"""Pallas TPU kernels for the Temporal UNet's hot blocks.

The UNet's per-step latency is dominated by ~50 small sequential conv ops
(see README performance notes): each XLA conv at horizon <= 50 is
launch-latency-bound, not FLOP-bound.  This kernel fuses an entire
Conv1dBlock — k-tap conv (as k shifted MXU matmuls) + GroupNorm(8) + Mish —
into ONE kernel per block, cutting the per-block kernel count ~3x.

Grid: one program per batch row; each program holds the full (L, C)
activation tile in VMEM (50 x 512 f32 = 100 KB max), computes the conv by
accumulating k shifted matmuls against the (k, Cin, Cout) weights, then
applies the group normalisation and Mish in-register.

``conv1d_block`` matches models/temporal_unet.Conv1dBlock exactly (see
conv1d_block_reference + tests/test_pallas_blocks.py, which run the kernel
in interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _make_kernel(kernel_size: int, num_groups: int, eps: float):
    def kern(x_ref, w_ref, b_ref, scale_ref, bias_ref, o_ref):
        x = x_ref[0]                      # (L, Cin)
        L, Cin = x.shape
        Cout = o_ref.shape[-1]
        pad = kernel_size // 2

        acc = jnp.zeros((L, Cout), jnp.float32)
        # conv as k shifted matmuls: y[t] = sum_k x[t + k - pad] @ W[k].
        # One zero-pad up front, then fixed-length slices per tap — avoids
        # zero-size slices at tiny horizons (L=2 at the UNet's bottom level).
        zpad = jnp.zeros((pad, Cin), x.dtype)
        xpad = jnp.concatenate([zpad, x, zpad], axis=0)  # (L + 2*pad, Cin)
        for k in range(kernel_size):
            acc = acc + jnp.dot(xpad[k:k + L, :], w_ref[k],
                                preferred_element_type=jnp.float32)
        acc = acc + b_ref[:]

        # GroupNorm: stats over (L, C/num_groups) per contiguous group.
        # Mosaic can't reshape across the lane dim ((L,C)->(L,g,cg)), so the
        # group reductions/broadcasts go through a (C, g) membership matrix.
        cg = Cout // num_groups
        group_id = jax.lax.broadcasted_iota(jnp.int32, (Cout, num_groups), 0) // cg
        gidx = jax.lax.broadcasted_iota(jnp.int32, (Cout, num_groups), 1)
        member = (group_id == gidx).astype(jnp.float32)      # (C, g)

        # The membership matmuls are tiny (1,C)x(C,g) contractions; force
        # full f32 MXU passes (default bf16 precision costs ~1e-2 absolute
        # error in the stats on real hardware).
        hi = jax.lax.Precision.HIGHEST
        n = jnp.float32(L * cg)
        ch_sum = jnp.sum(acc, axis=0, keepdims=True)          # (1, C)
        g_mean = jnp.dot(ch_sum, member, precision=hi,
                         preferred_element_type=jnp.float32) / n     # (1, g)
        mean_c = jnp.dot(g_mean, member.T, precision=hi,
                         preferred_element_type=jnp.float32)         # (1, C)
        # two-pass variance: centre first, then sum of squares — immune to
        # the E[x^2]-E[x]^2 cancellation when |mean| >> std; clamp guards the
        # residual rounding so rsqrt never sees a negative.
        centered = acc - mean_c
        cent_sumsq = jnp.sum(centered * centered, axis=0, keepdims=True)
        g_var = jnp.dot(cent_sumsq, member, precision=hi,
                        preferred_element_type=jnp.float32) / n      # (1, g)
        g_var = jnp.maximum(g_var, 0.0)
        rstd_c = jnp.dot(jax.lax.rsqrt(g_var + eps), member.T, precision=hi,
                         preferred_element_type=jnp.float32)
        y = centered * rstd_c * scale_ref[:] + bias_ref[:]

        o_ref[0] = _mish(y)

    return kern


@functools.partial(jax.jit, static_argnames=("kernel_size", "num_groups",
                                             "eps", "interpret"))
def conv1d_block(x, kernel, conv_bias, gn_scale, gn_bias, *,
                 kernel_size: int = 5, num_groups: int = 8,
                 eps: float = 1e-5, interpret: bool = False):
    """Fused Conv1dBlock.

    x : (B, L, Cin); kernel : (k, Cin, Cout) (flax nn.Conv layout);
    conv_bias/gn_scale/gn_bias : (Cout,).  Returns (B, L, Cout) float32.
    """
    B, L, Cin = x.shape
    k, _, Cout = kernel.shape
    assert k == kernel_size
    f = pl.pallas_call(
        _make_kernel(kernel_size, num_groups, eps),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, Cin), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kernel_size, Cin, Cout), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, Cout), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, Cout), jnp.float32),
        interpret=interpret,
    )
    return f(x, kernel, conv_bias, gn_scale, gn_bias)


def conv1d_block_reference(x, kernel, conv_bias, gn_scale, gn_bias,
                           kernel_size=5, num_groups=8, eps=1e-5):
    """jnp reference (same math as models/temporal_unet.Conv1dBlock)."""
    pad = kernel_size // 2
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC")) + conv_bias
    B, L, C = y.shape
    g = y.reshape(B, L, num_groups, C // num_groups)
    mean = jnp.mean(g, axis=(1, 3), keepdims=True)
    var = jnp.var(g, axis=(1, 3), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    y = g.reshape(B, L, C) * gn_scale + gn_bias
    return _mish(y)
