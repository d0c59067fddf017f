"""PointNet++ set-abstraction ops and the MPiNets point-cloud encoder (JAX).

TPU-native replacement for the ``pointnet2_ops`` CUDA extension used by the
reference's MPiNets baseline (``mpinets/model.py:27,355-428``).  The CUDA
kernels (furthest-point sampling, ball query, grouping) are re-designed as
static-shape JAX ops:

  * ``furthest_point_sample`` — the sequential argmax recurrence as a
    ``lax.scan`` over the sample count; the O(S*N) distance updates are
    full-width vector ops, so each scan step is one fused VPU kernel.
  * ``ball_query`` — the CUDA kernel's "first K points within the radius, in
    point order" semantics reproduced with a sort over masked index keys
    (no data-dependent loops, fully vmappable).
  * grouping — plain ``take`` gathers; XLA fuses the center-subtract and
    feature concat into the downstream MLP.

Everything is batched with ``vmap`` and differentiable where meaningful
(gradients flow through gathered coordinates, not through the discrete
index selection — same as the CUDA ops).

Encoder topology parity (mpinets/model.py:355-428): three
``PointnetSAModule``s — (npoint=512, r=0.05, K=128, mlp [1,64,64,64]),
(npoint=128, r=0.3, K=128, mlp [64,128,128,256]), (group-all,
mlp [256,512,512,1024]) — all ``bn=False`` (plain ReLU MLPs), with
``use_xyz=True`` (+3 input channels), then an fc head
1024 -> 4096 -> 2048 -> 2048 with GroupNorm(16) + LeakyReLU.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def furthest_point_sample(xyz: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """Iterative furthest-point sampling of one cloud.

    Parameters
    ----------
    xyz : (N, 3) point coordinates.
    n_samples : static number of centroids to select.

    Returns
    -------
    (n_samples,) int32 indices.  The first centroid is point 0 (the CUDA
    kernel's convention), each subsequent one maximizes the minimum squared
    distance to the already-chosen set.
    """
    n = xyz.shape[0]

    def step(carry, _):
        min_d2, last = carry
        d2 = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2).astype(jnp.int32)
        return (min_d2, nxt), last

    init = (jnp.full((n,), jnp.inf, xyz.dtype), jnp.int32(0))
    _, idx = jax.lax.scan(step, init, None, length=n_samples)
    return idx


def ball_query(centers: jnp.ndarray, xyz: jnp.ndarray, radius: float,
               n_neighbors: int) -> jnp.ndarray:
    """First ``n_neighbors`` points (in point order) within ``radius`` of each
    center — the pointnet2 ball-query contract.

    Parameters
    ----------
    centers : (S, 3) query centers.
    xyz : (N, 3) cloud.
    radius : float ball radius (strict ``<`` like the CUDA kernel).
    n_neighbors : static K.

    Returns
    -------
    (S, K) int32 indices.  Slots beyond the number of in-radius points repeat
    the first in-radius point; centers with NO in-radius point return all
    zeros (the CUDA kernel leaves its zero-initialized buffer).
    """
    n = xyz.shape[0]
    d2 = jnp.sum((centers[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    within = d2 < radius * radius                     # (S, N)
    # Sort keys: in-radius points keep their index, the rest push past N so
    # ascending order is exactly "in-radius points in point order".
    key = jnp.where(within, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    first_k = jnp.sort(key, axis=-1)[:, :n_neighbors]  # (S, K)
    any_within = jnp.any(within, axis=-1, keepdims=True)
    fill = jnp.where(any_within, first_k[:, :1], 0)
    return jnp.where(first_k >= n, fill, first_k).astype(jnp.int32)


def group_points(xyz: jnp.ndarray, features: Optional[jnp.ndarray],
                 centers: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather + center-subtract + feature concat for one cloud.

    xyz (N, 3), features (N, C) or None, centers (S, 3), idx (S, K)
    -> (S, K, 3 + C) grouped channels (local xyz first — use_xyz=True).
    """
    grouped_xyz = jnp.take(xyz, idx, axis=0) - centers[:, None, :]
    if features is None:
        return grouped_xyz
    return jnp.concatenate([grouped_xyz, jnp.take(features, idx, axis=0)],
                           axis=-1)


class SetAbstraction(nn.Module):
    """One PointNet++ SA level: FPS -> ball query -> grouped MLP -> max pool.

    ``npoint=None`` is the group-all level (single descriptor over the whole
    cloud).  ``mlp`` lists the OUTPUT widths; the input width is
    3 + n_features (use_xyz).  ``bn=False`` topology: Dense + ReLU stacks
    (pointnet2 SharedMLP with batch-norm disabled, as configured at
    mpinets/model.py:365-383).
    """

    npoint: Optional[int]
    radius: Optional[float]
    n_neighbors: Optional[int]
    mlp: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, features: Optional[jnp.ndarray]
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """xyz (B, N, 3), features (B, N, C) or None ->
        (B, S, 3) new centers, (B, S, mlp[-1]) new features (S=1 if group-all).
        """
        if self.npoint is None:
            centers = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
            grouped = xyz[:, None, :, :]
            if features is not None:
                grouped = jnp.concatenate(
                    [grouped, features[:, None, :, :]], axis=-1)
        else:
            idx = jax.vmap(furthest_point_sample,
                           in_axes=(0, None))(xyz, self.npoint)
            centers = jnp.take_along_axis(xyz, idx[..., None], axis=1)
            nbr = jax.vmap(ball_query, in_axes=(0, 0, None, None))(
                centers, xyz, self.radius, self.n_neighbors)
            grouped = jax.vmap(group_points)(xyz, features, centers, nbr)
        x = grouped
        for width in self.mlp:
            x = nn.Dense(width, dtype=self.dtype)(x)
            x = nn.relu(x)
        return centers, jnp.max(x, axis=-2)


class MPiNetsPointNet(nn.Module):
    """The MPiNets point-cloud encoder (mpinets/model.py:355-428), channels
    last: (B, N, 4) segmented cloud -> (B, 2048) embedding."""

    dtype: Any = None

    @nn.compact
    def __call__(self, point_cloud: jnp.ndarray) -> jnp.ndarray:
        assert point_cloud.shape[-1] == 4, "expected xyz + segmentation mask"
        xyz = point_cloud[..., :3]
        features = point_cloud[..., 3:]
        xyz, features = SetAbstraction(
            npoint=512, radius=0.05, n_neighbors=128, mlp=(64, 64, 64),
            dtype=self.dtype, name="sa1")(xyz, features)
        xyz, features = SetAbstraction(
            npoint=128, radius=0.3, n_neighbors=128, mlp=(128, 128, 256),
            dtype=self.dtype, name="sa2")(xyz, features)
        _, features = SetAbstraction(
            npoint=None, radius=None, n_neighbors=None, mlp=(512, 512, 1024),
            dtype=self.dtype, name="sa3")(xyz, features)
        x = features[:, 0, :]                        # (B, 1024)
        x = nn.Dense(4096, dtype=self.dtype, name="fc1")(x)
        x = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=jnp.float32,
                         name="gn1")(x)
        x = nn.leaky_relu(x)
        x = nn.Dense(2048, dtype=self.dtype, name="fc2")(x)
        x = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=jnp.float32,
                         name="gn2")(x)
        x = nn.leaky_relu(x)
        return nn.Dense(2048, dtype=self.dtype, name="fc3")(x)
