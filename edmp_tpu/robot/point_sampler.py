"""Robot surface point clouds and collision spheres from the link-box model.

TPU-native replacement for robofin's ``FrankaSampler`` /
``FrankaCollisionSampler`` (used by the reference's MPiNets baseline at
``mpinets/model.py:25,266-271`` and ``mpinets/loss.py:28,141-153``).  robofin
samples mesh surfaces; this repo's robot geometry is the vendored 9-link box
model (``constants.LINK_BOX_DIMS`` + static frames), so the sampler draws a
FIXED, area-weighted point set on the box surfaces once at build time and
transforms it with the batched FK at call time — one gather + one small
contraction, fully jittable and differentiable w.r.t. joints.

A fixed point set (robofin's ``num_fixed_points`` mode) is what the MPiNets
losses require: point-match MSE between two clouds is only meaningful when
both are sampled at the same body-frame points (mpinets/loss.py:123-128).

Collision spheres follow the inscribed-capsule model
(``robot/self_collision.py``): spheres of the capsule radius placed along the
capsule axis — the same role as robofin's per-link sphere decomposition
(``compute_spheres``, mpinets/model.py:300-312).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from edmp_tpu import constants as C
from edmp_tpu.robot import self_collision as SC
from edmp_tpu.robot.kinematics import link_box_frames


def _box_surface_points(half: np.ndarray, n: int,
                        rng: np.random.Generator) -> np.ndarray:
    """n points uniform on the surface of a box with half-extents ``half``."""
    hx, hy, hz = half
    face_areas = np.array([hy * hz, hy * hz, hx * hz, hx * hz, hx * hy,
                           hx * hy]) * 4.0
    total = face_areas.sum()
    probs = (face_areas / total if total > 0
             else np.full(6, 1.0 / 6.0))
    faces = rng.choice(6, size=n, p=probs)
    uv = rng.uniform(-1.0, 1.0, size=(n, 2))
    pts = np.empty((n, 3))
    for f in range(6):
        m = faces == f
        axis = f // 2
        sign = 1.0 if f % 2 == 0 else -1.0
        others = [a for a in range(3) if a != axis]
        pts[m, axis] = sign * half[axis]
        pts[m, others[0]] = uv[m, 0] * half[others[0]]
        pts[m, others[1]] = uv[m, 1] * half[others[1]]
    return pts


def build_fixed_points(num_points: int = 1024, seed: int = 0,
                       with_base_link: bool = False
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Area-weighted fixed surface point set over the 9 link boxes.

    Returns (local_points (num_points, 3), link_ids (num_points,) int32).
    ``with_base_link`` is accepted for API parity with robofin; the box model
    has no base-link box, so it is a no-op.
    """
    del with_base_link
    if num_points < C.NUM_LINKS:
        # the min-1-per-link floor below needs at least one point per link;
        # fewer would drive counts to 0 and divide by zero in the rebalance
        raise ValueError(
            f"num_points must be >= {C.NUM_LINKS} (one per link box), "
            f"got {num_points}")
    rng = np.random.default_rng(seed)
    half = np.asarray(C.LINK_BOX_DIMS, np.float64) / 2.0   # (9, 3)
    areas = 8.0 * (half[:, 0] * half[:, 1] + half[:, 1] * half[:, 2]
                   + half[:, 0] * half[:, 2])
    counts = np.maximum((areas / areas.sum() * num_points).astype(int), 1)
    while counts.sum() > num_points:
        counts[np.argmax(counts)] -= 1
    while counts.sum() < num_points:
        counts[np.argmax(areas / counts)] += 1
    locals_, ids = [], []
    for l in range(C.NUM_LINKS):
        locals_.append(_box_surface_points(half[l], int(counts[l]), rng))
        ids.append(np.full(int(counts[l]), l, np.int32))
    return (np.concatenate(locals_).astype(np.float32),
            np.concatenate(ids))


class RobotPointSampler:
    """Callable sampler: joints (..., 7) -> surface points (..., N, 3)."""

    def __init__(self, num_points: int = 1024, seed: int = 0):
        self.num_points = num_points
        local, ids = build_fixed_points(num_points, seed)
        self._local = jnp.asarray(local)          # (N, 3)
        self._ids = jnp.asarray(ids)              # (N,)

    def __call__(self, joints: jnp.ndarray) -> jnp.ndarray:
        R, p = link_box_frames(joints)            # (..., 9, 3, 3), (..., 9, 3)
        Rg = jnp.take(R, self._ids, axis=-3)      # (..., N, 3, 3)
        pg = jnp.take(p, self._ids, axis=-2)      # (..., N, 3)
        return pg + jnp.einsum("...nij,nj->...ni", Rg, self._local)


def build_collision_spheres(spheres_per_link: int = 4
                            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sphere decomposition of the inscribed capsules.

    Returns (link_ids (M,), local_offsets (M, 3) along each box's capsule
    axis, radii (M,)) with M = 9 * spheres_per_link.  Covers each capsule end
    to end (fractions -1..1 of the half-length).
    """
    dims = np.asarray(C.LINK_BOX_DIMS, np.float64)
    axis = np.argmax(dims, axis=1)
    fracs = (np.linspace(-1.0, 1.0, spheres_per_link)
             if spheres_per_link > 1 else np.zeros(1))
    ids, offs, radii = [], [], []
    for l in range(C.NUM_LINKS):
        direction = np.eye(3)[axis[l]]
        for f in fracs:
            ids.append(l)
            offs.append(direction * f * SC.CAPSULE_HALF_LEN[l])
            radii.append(SC.CAPSULE_RADIUS[l])
    return (np.asarray(ids, np.int32), np.asarray(offs, np.float32),
            np.asarray(radii, np.float32))


class CollisionSphereSampler:
    """joints (..., 7) -> (centers (..., M, 3), radii (M,)) sphere model."""

    def __init__(self, spheres_per_link: int = 4):
        ids, offs, radii = build_collision_spheres(spheres_per_link)
        self._ids = jnp.asarray(ids)
        self._offs = jnp.asarray(offs)
        self.radii = jnp.asarray(radii)

    def __call__(self, joints: jnp.ndarray) -> jnp.ndarray:
        R, p = link_box_frames(joints)
        Rg = jnp.take(R, self._ids, axis=-3)
        pg = jnp.take(p, self._ids, axis=-2)
        return pg + jnp.einsum("...nij,nj->...ni", Rg, self._offs)
