"""Temporal 1-D UNet denoiser (epsilon-prediction) in Flax, TPU layout.

Re-designed from the reference topology (``diffusion/models/temporalunet.py``,
``diffusion/models/blocks.py``) with channels-last ``(B, N, C)`` tensors so
channels ride the TPU lane dimension and XLA fuses conv + GroupNorm + Mish.

Topology parity notes (for checkpoint conversion):
  * attention slots are identity in the shipped architecture
    (blocks.py:210,229,248) — they are simply omitted here;
  * odd-length skip reconciliation crops the LAST element when an upsampled
    length hits {8, 14, 26} (temporalunet.py:70-71);
  * the reference's first skip (h at full horizon) is produced but never
    consumed — same here;
  * ConvTranspose1d(k=4, s=2, p=1) is implemented as an lhs-dilated conv with
    a flipped kernel so torch weights map exactly (see ``convert.py``);
  * GroupNorm(8) with eps=1e-5 matches torch defaults.

Default hyperparameters: input_dim=7, time_dim=32, dims=(32,64,128,256,512,512)
(infer_serial.py:50).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def sinusoidal_pos_emb(t, dim):
    """(B,) timesteps -> (B, dim) embedding (blocks.py:38-54)."""
    half = dim // 2
    freq = jnp.exp(jnp.arange(half, dtype=t.dtype) * (-np.log(10000.0) / (half - 1)))
    ang = t[:, None] * freq[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class TimeEmbedding(nn.Module):
    """SinPosEmb -> Dense(4d) -> Mish -> Dense(d)  (blocks.py:76-92)."""

    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, t):
        e = sinusoidal_pos_emb(t, self.dim)
        e = nn.Dense(self.dim * 4, dtype=self.dtype, name="dense1")(e)
        e = mish(e)
        return nn.Dense(self.dim, dtype=self.dtype, name="dense2")(e)


class _ConvParams(nn.Module):
    """Parameter-only holder mirroring nn.Conv's param tree ({kernel, bias})
    so the Pallas path shares checkpoints with the XLA path."""

    features: int
    kernel_size: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _NormParams(nn.Module):
    """Parameter-only holder mirroring nn.GroupNorm's {scale, bias}."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class Conv1dBlock(nn.Module):
    """Conv1d(k, pad=k//2) -> GroupNorm(8) -> Mish  (blocks.py:13-34).

    Convs compute in ``dtype`` (e.g. bfloat16); GroupNorm statistics stay in
    float32 for stability.

    ``use_pallas=True`` routes the whole block through the fused Pallas TPU
    kernel (models/pallas_blocks.py) — one kernel instead of conv+GN+Mish.
    Same parameter tree, so checkpoints are interchangeable.  Forward-only
    (no custom VJP): inference path; training keeps the XLA path."""

    features: int
    kernel_size: int
    dtype: Any = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        if self.use_pallas:
            # the fused kernel computes in float32 regardless of self.dtype;
            # refuse the silent f32 fallback a bf16 caller would get
            assert self.dtype is None, \
                "use_pallas computes in float32; dtype must be None"
            from edmp_tpu.models import pallas_blocks as PB

            kernel, cbias = _ConvParams(self.features, self.kernel_size,
                                        x.shape[-1], name="conv")()
            scale, nbias = _NormParams(self.features, name="norm")()
            interpret = jax.default_backend() != "tpu"
            return PB.conv1d_block(
                x.astype(jnp.float32), kernel, cbias, scale, nbias,
                kernel_size=self.kernel_size, interpret=interpret)
        p = self.kernel_size // 2
        x = nn.Conv(self.features, (self.kernel_size,), padding=[(p, p)],
                    dtype=self.dtype, name="conv")(x)
        x = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=jnp.float32,
                         name="norm")(x)
        return mish(x)


class ResConvBlock(nn.Module):
    """Two Conv1dBlocks + broadcast time signal + 1x1 residual
    (blocks.py:137-166)."""

    features: int
    kernel_size: int = 5
    dtype: Any = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, temb):
        out = Conv1dBlock(self.features, self.kernel_size, self.dtype,
                          self.use_pallas, name="block1")(x)
        # TimeMLP: Mish -> Dense, broadcast over the horizon (blocks.py:58-72)
        tsig = nn.Dense(self.features, dtype=self.dtype,
                        name="time_dense")(mish(temb))
        out = out + tsig[:, None, :]
        out = Conv1dBlock(self.features, self.kernel_size, self.dtype,
                          self.use_pallas, name="block2")(out)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1,), dtype=self.dtype,
                        name="residual_conv")(x)
        return out + x


class LinearAttention(nn.Module):
    """Linear attention (blocks.py:100-133).  The shipped EDMP checkpoints
    replace this with identity (blocks.py:210,229,248); it is provided as an
    opt-in (TemporalUNet(use_attention=True)) for architecture ablations."""

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):  # (B, N, C)
        B, N, Cin = x.shape
        h, d = self.heads, self.dim_head
        qkv = nn.Conv(h * d * 3, (1,), use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, h, d), 3, axis=2)
        q = q[:, :, 0] * (d ** -0.5)        # (B, N, h, d)
        k = jax.nn.softmax(k[:, :, 0], axis=1)  # softmax over sequence
        v = v[:, :, 0]
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(B, N, h * d)
        return nn.Conv(Cin, (1,), name="to_out")(out)


class ResidualAttentionBlock(nn.Module):
    """Channel LayerNorm -> LinearAttention -> residual (blocks.py:170-196)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (C,))
        b = self.param("b", nn.initializers.zeros, (C,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        normed = (x - mean) / jnp.sqrt(var + self.eps) * g + b
        return x + LinearAttention(name="attention")(normed)


class ConvTranspose1dTorch(nn.Module):
    """torch.nn.ConvTranspose1d(C, C, k=4, s=2, p=1) with exact semantics.

    Implemented as conv_general_dilated with lhs_dilation=s and padding
    k-1-p, kernel stored pre-flipped (see models/convert.py), so the output
    length is exactly 2N.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = self.kernel_size - 1 - self.padding
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias


class DownSampler(nn.Module):
    """rcb x2 -> (attention slot) -> stride-2 conv (blocks.py:202-220)."""

    features: int
    is_last: bool = False
    use_attention: bool = False
    dtype: Any = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, temb):
        x = ResConvBlock(self.features, dtype=self.dtype,
                         use_pallas=self.use_pallas, name="rcb1")(x, temb)
        h = ResConvBlock(self.features, dtype=self.dtype,
                         use_pallas=self.use_pallas, name="rcb2")(x, temb)
        if self.use_attention:
            h = ResidualAttentionBlock(name="attn")(h)
        if self.is_last:
            return h, h
        out = nn.Conv(self.features, (3,), strides=(2,), padding=[(1, 1)],
                      dtype=self.dtype, name="downconv")(h)
        return out, h


class MiddleBlock(nn.Module):
    features: int
    use_attention: bool = False
    dtype: Any = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, temb):
        x = ResConvBlock(self.features, dtype=self.dtype,
                         use_pallas=self.use_pallas, name="rcb1")(x, temb)
        if self.use_attention:
            x = ResidualAttentionBlock(name="attn")(x)
        return ResConvBlock(self.features, dtype=self.dtype,
                            use_pallas=self.use_pallas, name="rcb2")(x, temb)


class UpSampler(nn.Module):
    """cat(x, skip) -> rcb x2 -> (attention slot) -> ConvTranspose upsample
    (blocks.py:240-259)."""

    features: int  # dim_in of the reference
    use_attention: bool = False
    dtype: Any = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, h, temb):
        x = jnp.concatenate([x, h], axis=-1)
        x = ResConvBlock(self.features, dtype=self.dtype,
                         use_pallas=self.use_pallas, name="rcb1")(x, temb)
        x = ResConvBlock(self.features, dtype=self.dtype,
                         use_pallas=self.use_pallas, name="rcb2")(x, temb)
        if self.use_attention:
            x = ResidualAttentionBlock(name="attn")(x)
        return ConvTranspose1dTorch(self.features, dtype=self.dtype,
                                    name="upconv")(x)


class TemporalUNet(nn.Module):
    """The flagship denoiser.  x: (B, N, C) channels-last, t: (B,) or (1,)."""

    input_dim: int = 7
    time_dim: int = 32
    dims: Sequence[int] = (32, 64, 128, 256, 512, 512)
    use_attention: bool = False  # identity slots in the shipped checkpoints
    dtype: Any = None  # compute dtype for convs/denses (e.g. jnp.bfloat16)
    use_pallas: bool = False  # fused Conv1dBlock kernels (inference only)

    @nn.compact
    def __call__(self, x, t):
        t = jnp.asarray(t, x.dtype)
        if t.ndim == 0:
            t = t[None]
        temb = TimeEmbedding(self.time_dim, dtype=self.dtype,
                             name="time_embedding")(t)

        all_dims = (self.input_dim, *self.dims)
        n_down = len(all_dims) - 1

        skips = []
        for i in range(n_down):
            is_last = i == n_down - 1
            x, h = DownSampler(all_dims[i + 1], is_last, self.use_attention,
                               self.dtype, self.use_pallas,
                               name=f"down_{i}")(x, temb)
            skips.append(h)

        x = MiddleBlock(all_dims[-1], self.use_attention, self.dtype,
                        self.use_pallas, name="middle")(x, temb)

        for u, i in enumerate(range(n_down, 1, -1)):
            h = skips.pop()
            x = UpSampler(all_dims[i - 1], self.use_attention, self.dtype,
                          self.use_pallas, name=f"up_{u}")(x, h, temb)
            # odd-length crop hack (temporalunet.py:70-71): lengths are
            # static under jit, so this is trace-time control flow.
            if x.shape[1] in (8, 14, 26):
                x = x[:, :-1, :]

        x = Conv1dBlock(all_dims[1], 5, self.dtype, self.use_pallas,
                        name="final_block")(x)
        out = nn.Conv(self.input_dim, (1,), dtype=self.dtype,
                      name="final_conv")(x)
        return out.astype(jnp.float32)


def create_model(input_dim=7, time_dim=32, dims=(32, 64, 128, 256, 512, 512),
                 dtype=None, use_attention=False, use_pallas=False):
    return TemporalUNet(input_dim=input_dim, time_dim=time_dim,
                        dims=tuple(dims), dtype=dtype,
                        use_attention=use_attention, use_pallas=use_pallas)


def init_params(rng, model: TemporalUNet, traj_len: int = 50):
    x = jnp.zeros((1, traj_len, model.input_dim), jnp.float32)
    t = jnp.ones((1,), jnp.float32)
    return model.init(rng, x, t)["params"]


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def host_init_params(model: TemporalUNet, traj_len: int = 50, seed: int = 0):
    """Initialise params on the host (numpy) — no device compile.

    On tunneled backends ``model.init`` costs minutes of remote compile; this
    reproduces flax's default initialisation statistically (lecun-normal
    kernels by fan-in, zero biases, unit norm scales) from ``eval_shape``.
    """
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, traj_len, model.input_dim)),
                             jnp.ones(1)),
        jax.random.key(seed))["params"]
    rng = np.random.default_rng(seed)

    def init_leaf(path, s):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("bias", "b"):
            return jnp.zeros(s.shape, s.dtype)
        if name in ("scale", "g"):
            return jnp.ones(s.shape, s.dtype)
        # kernels: fan_in = prod(all dims but last)
        fan_in = max(int(np.prod(s.shape[:-1])), 1)
        std = float(np.sqrt(1.0 / fan_in))
        # truncated normal at 2 std like lecun_normal
        vals = rng.normal(0.0, std, s.shape)
        vals = np.clip(vals, -2 * std, 2 * std)
        return jnp.asarray(vals, s.dtype)

    return jax.tree_util.tree_map_with_path(init_leaf, shapes)
