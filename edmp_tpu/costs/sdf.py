"""Batched exact signed distance fields for primitive scenes (JAX).

Counterpart of mpinets/geometry.py (TorchCuboids/TorchCylinders/TorchSpheres):
the natural TPU-side collision representation alternative to EDMP's AABB
volumes, usable as an additional guide family.  Each primitive set is a
batched struct with zero-volume masking (mpinets/geometry.py:56-58,155-157)
so padded scenes keep static shapes, and an ``sdf(points)`` that returns the
minimum signed distance per point over the set.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

_BIG = 1.0e8


def _safe_norm(x, axis=-1):
    """L2 norm with a well-defined (zero) gradient at ``x == 0``.

    ``jnp.linalg.norm`` backpropagates 0/0 = NaN at the origin — hit
    whenever a query point lies strictly INSIDE a primitive (the clamped
    outside-distance vector is exactly zero there), which poisons any
    training objective differentiated through the SDF (e.g. the policy
    collision hinge).  Values are bit-identical to the plain norm.
    """
    sq = jnp.sum(x * x, axis=axis)
    positive = sq > 0
    return jnp.where(positive, jnp.sqrt(jnp.where(positive, sq, 1.0)), 0.0)


def _quat_xyzw_rotmats(quats):
    from edmp_tpu.costs.obstacles import _quat_xyzw_to_matrix

    return jnp.asarray(_quat_xyzw_to_matrix(np.asarray(quats)), jnp.float32)


class Spheres(NamedTuple):
    centers: jnp.ndarray  # (M, 3)
    radii: jnp.ndarray    # (M,)

    @classmethod
    def create(cls, centers, radii):
        return cls(jnp.asarray(centers, jnp.float32).reshape(-1, 3),
                   jnp.asarray(radii, jnp.float32).reshape(-1))

    @property
    def mask(self):
        return self.radii > 0

    def sdf_all(self, points):
        """points (..., 3) -> (..., M) signed distance to each sphere."""
        d = _safe_norm(points[..., None, :] - self.centers)
        sd = d - self.radii
        return jnp.where(self.mask, sd, _BIG)

    def sdf(self, points):
        return jnp.min(self.sdf_all(points), axis=-1)


class Cuboids(NamedTuple):
    centers: jnp.ndarray   # (M, 3)
    inv_rot: jnp.ndarray   # (M, 3, 3)  world->box rotation
    half: jnp.ndarray      # (M, 3)

    @classmethod
    def create(cls, centers, dims, quats_xyzw):
        R = _quat_xyzw_rotmats(quats_xyzw)
        return cls(
            centers=jnp.asarray(centers, jnp.float32).reshape(-1, 3),
            inv_rot=jnp.swapaxes(R, -1, -2),
            half=jnp.asarray(dims, jnp.float32).reshape(-1, 3) / 2.0,
        )

    @property
    def mask(self):
        return jnp.all(self.half > 0, axis=-1)

    def sdf_all(self, points):
        """Exact box SDF per cuboid (mpinets/geometry.py:126-347 semantics)."""
        local = jnp.einsum("mij,...mj->...mi", self.inv_rot,
                           points[..., None, :] - self.centers)
        q = jnp.abs(local) - self.half
        outside = _safe_norm(jnp.maximum(q, 0.0))
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        return jnp.where(self.mask, outside + inside, _BIG)

    def sdf(self, points):
        return jnp.min(self.sdf_all(points), axis=-1)


class Cylinders(NamedTuple):
    centers: jnp.ndarray   # (M, 3)
    inv_rot: jnp.ndarray   # (M, 3, 3)
    radii: jnp.ndarray     # (M,)
    half_h: jnp.ndarray    # (M,)

    @classmethod
    def create(cls, centers, radii, heights, quats_xyzw):
        R = _quat_xyzw_rotmats(quats_xyzw)
        return cls(
            centers=jnp.asarray(centers, jnp.float32).reshape(-1, 3),
            inv_rot=jnp.swapaxes(R, -1, -2),
            radii=jnp.asarray(radii, jnp.float32).reshape(-1),
            half_h=jnp.asarray(heights, jnp.float32).reshape(-1) / 2.0,
        )

    @property
    def mask(self):
        return (self.radii > 0) & (self.half_h > 0)

    def sdf_all(self, points):
        """Exact capped-cylinder SDF (axis = local z)."""
        local = jnp.einsum("mij,...mj->...mi", self.inv_rot,
                           points[..., None, :] - self.centers)
        dr = _safe_norm(local[..., :2]) - self.radii
        dz = jnp.abs(local[..., 2]) - self.half_h
        outside = _safe_norm(
            jnp.maximum(jnp.stack([dr, dz], axis=-1), 0.0))
        inside = jnp.minimum(jnp.maximum(dr, dz), 0.0)
        return jnp.where(self.mask, outside + inside, _BIG)

    def sdf(self, points):
        return jnp.min(self.sdf_all(points), axis=-1)


def scene_sdf(points, cuboids: Cuboids | None = None,
              cylinders: Cylinders | None = None,
              spheres: Spheres | None = None):
    """Minimum SDF over a mixed primitive scene, (..., 3) -> (...)."""
    parts = []
    for prim in (cuboids, cylinders, spheres):
        if prim is not None:
            parts.append(prim.sdf(points))
    if not parts:
        return jnp.full(points.shape[:-1], _BIG, jnp.float32)
    out = parts[0]
    for p in parts[1:]:
        out = jnp.minimum(out, p)
    return out


def collision_hinge(sdf_values, margin: float = 0.03):
    """Hinge collision penalty on SDF (mpinets/loss.py:47-94 semantics)."""
    return jnp.sum(jnp.maximum(margin - sdf_values, 0.0))
