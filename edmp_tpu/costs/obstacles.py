"""Static-shape obstacle representation for collision costs.

The reference carries obstacles as a dynamic (n, 10) array of
``[center(3), quat_xyzw(4), dims(3)]`` rows and rebuilds per-step AABBs by
transforming 8 box corners (``lib/guide.py:118-158``).  For XLA we need static
shapes: scenes are padded to ``MAX_OBSTACLES`` with phantom boxes placed far
outside the workspace (zero dims, identity rotation), so padded entries can
never overlap a reachable link box even after the expansion/clearance floors.

The per-step AABB is computed as ``center ± |R| @ (sizes/2)`` — algebraically
identical to the corner min/max of the reference, but one abs-matmul instead
of an (8-corner) gather.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from edmp_tpu import constants as C


class SceneObstacles(NamedTuple):
    """Padded obstacle set of one scene (all arrays static-shape).

    centers : (O, 3) float
    abs_rot : (O, 3, 3) float  — elementwise |R| of the obstacle rotation
    dims    : (O, 3) float     — full box extents (cylinders already boxed)
    rot     : (O, 3, 3) float or None — the FULL obstacle rotation; only
              needed by the exact-SDF clearance guide term
              (costs/clearance.py).  None keeps pre-round-5 pytrees valid
              (None is an empty pytree node, so programs that never touch
              it are byte-identical).
    """

    centers: jnp.ndarray
    abs_rot: jnp.ndarray
    dims: jnp.ndarray
    rot: jnp.ndarray | None = None

    @property
    def max_obstacles(self) -> int:
        return self.centers.shape[-2]


def _quat_xyzw_to_matrix(q: np.ndarray) -> np.ndarray:
    """Rotation matrices from (..., 4) xyzw quaternions (numpy, host-side)."""
    q = np.asarray(q, dtype=np.float64)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty(q.shape[:-1] + (3, 3))
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - z * w)
    R[..., 0, 2] = 2 * (x * z + y * w)
    R[..., 1, 0] = 2 * (x * y + z * w)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - x * w)
    R[..., 2, 0] = 2 * (x * z - y * w)
    R[..., 2, 1] = 2 * (y * z + x * w)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def pack_scene(obstacle_config: np.ndarray, max_obstacles: int | None = None,
               dtype=jnp.float32) -> SceneObstacles:
    """Pack a reference-format (n, 10) obstacle config into a padded scene.

    Row layout [center(3), quat_xyzw(4), dims(3)] matches
    datasets/load_test_dataset.py:150 / lib/guide.py:127-144.
    """
    if max_obstacles is None:
        max_obstacles = C.MAX_OBSTACLES
    cfg = np.asarray(obstacle_config, dtype=np.float64).reshape(-1, 10)
    n = cfg.shape[0]
    if n > max_obstacles:
        raise ValueError(f"scene has {n} obstacles > max_obstacles={max_obstacles}")

    centers = np.full((max_obstacles, 3), C.PHANTOM_OBSTACLE_CENTER)
    dims = np.zeros((max_obstacles, 3))
    rots = np.tile(np.eye(3), (max_obstacles, 1, 1))
    if n:
        centers[:n] = cfg[:, :3]
        dims[:n] = cfg[:, 7:]
        rots[:n] = _quat_xyzw_to_matrix(cfg[:, 3:7])
    return SceneObstacles(
        centers=jnp.asarray(centers, dtype=dtype),
        abs_rot=jnp.asarray(np.abs(rots), dtype=dtype),
        dims=jnp.asarray(dims, dtype=dtype),
        rot=jnp.asarray(rots, dtype=dtype),
    )


def obstacle_aabbs(scene: SceneObstacles, expansion=None, clearance=None):
    """Per-sample obstacle AABBs with the ensemble hyperparameter schedule.

    Reference semantics (lib/guide.py:118-158): at step t>0 the box extents are
    floored elementwise at ``expansion[t-1]`` (scalar per sample) and then grown
    additively by ``clearance[t-1]``; at t==0 the raw extents are used.

    Parameters
    ----------
    expansion, clearance : scalars or (B,) arrays, or None for the t==0 case.

    Returns
    -------
    lo, hi : (B, O, 3) if per-sample args given else (O, 3).
    """
    sizes = scene.dims
    if expansion is not None:
        e = jnp.asarray(expansion)[..., None, None]
        sizes = jnp.maximum(sizes, e)
    if clearance is not None:
        cl = jnp.asarray(clearance)[..., None, None]
        sizes = sizes + cl
    ext = jnp.einsum("...oij,...oj->...oi", scene.abs_rot, sizes * 0.5)
    return scene.centers - ext, scene.centers + ext


def stack_scenes(scenes) -> "SceneObstacles":
    """Stack a list of equally-padded scenes along a leading axis."""
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)


def tile_scene_per_sample(scenes: SceneObstacles, samples_per_scene: int
                          ) -> SceneObstacles:
    """(S, O, ...) scene arrays -> per-sample (S*samples, O, ...) arrays.

    This is the scene-folding layout: instead of vmapping the planner over
    scenes (which multiplies XLA compile cost), scenes ride the batch axis and
    every sample carries its own obstacle set — the cost engine is already
    per-sample because of the ensemble hyperparameters.
    """
    return SceneObstacles(
        centers=jnp.repeat(scenes.centers, samples_per_scene, axis=0),
        abs_rot=jnp.repeat(scenes.abs_rot, samples_per_scene, axis=0),
        dims=jnp.repeat(scenes.dims, samples_per_scene, axis=0),
        rot=(None if scenes.rot is None
             else jnp.repeat(scenes.rot, samples_per_scene, axis=0)),
    )
