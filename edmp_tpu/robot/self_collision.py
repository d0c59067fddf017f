"""Inscribed-capsule self-collision model.

Replaces the round-2 OBB screen, whose conservative link boxes overlap
STRUCTURALLY for three pairs (forearm vs wrist/hand/finger) and therefore
needed blanket exclusions — leaving it blind exactly where real Franka
self-collisions happen.  Each link box is replaced by its inscribed capsule:
axis = the box's longest dimension, radius = the smaller of the two cross
half-extents, segment endpoints inset by the radius so the capsule lies
entirely inside the box.  Inscribed capsules separate in every structural
case, so NO per-pair exclusions are needed beyond kinematic rigidity:

  * pairs of boxes riding joint frames <= 1 apart share a joint (they touch
    by construction at every configuration) — including the hand/finger
    cluster, which is RIGID (all three boxes ride joint frame 7).

Fidelity study vs the old screen: docs/self_collision.md
(tools/self_collision_study.py).  Reference counterpart: robofin's
FrankaSelfCollisionChecker sphere model used at mpinets/metrics.py:278-291.
"""

from __future__ import annotations

import numpy as np

from edmp_tpu import constants as C

# ---------------------------------------------------------------------------
# Capsule parameters (derived once from the vendored link boxes)
# ---------------------------------------------------------------------------

_DIMS = np.asarray(C.LINK_BOX_DIMS, np.float64)          # (9, 3)
_AXIS = np.argmax(_DIMS, axis=1)                          # longest box axis
_RADii_cross = np.sort(_DIMS, axis=1)[:, :2] / 2.0
CAPSULE_RADIUS = _RADii_cross[:, 0]                       # min cross half-dim
CAPSULE_HALF_LEN = np.maximum(
    _DIMS[np.arange(9), _AXIS] / 2.0 - CAPSULE_RADIUS, 0.0)

# screened pairs: joint frames >= 2 apart (relative motion across at least
# one free joint; closer pairs touch at their shared joint by construction,
# and the hand/finger cluster is rigid — frames [7,7,7])
_LJ = np.asarray(C.LINK_JOINT_FRAME, np.int64)
SELF_PAIRS = [(i, j) for i in range(9) for j in range(i + 1, 9)
              if _LJ[j] - _LJ[i] >= 2]
_PI = np.asarray([p[0] for p in SELF_PAIRS])
_PJ = np.asarray([p[1] for p in SELF_PAIRS])


def capsule_endpoints(R: np.ndarray, p: np.ndarray):
    """World capsule segments from link-box frames.

    R (..., 9, 3, 3), p (..., 9, 3) -> (a0, a1) each (..., 9, 3).
    The capsule axis is the box axis ``_AXIS[l]``: world direction =
    R[..., l, :, _AXIS[l]].
    """
    onehot = np.eye(3)[_AXIS]                             # (9, 3)
    axis_dir = np.einsum("...lij,lj->...li", R, onehot)   # (..., 9, 3)
    off = axis_dir * CAPSULE_HALF_LEN[:, None]
    return p - off, p + off


def segment_distance(a0, a1, b0, b1):
    """Minimum distance between segments [a0,a1] and [b0,b1], (..., 3) ->
    (...).  Robust clamped closed form (handles degenerate/parallel
    segments)."""
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = np.sum(d1 * d1, axis=-1)
    e = np.sum(d2 * d2, axis=-1)
    f = np.sum(d2 * r, axis=-1)
    c = np.sum(d1 * r, axis=-1)
    b = np.sum(d1 * d2, axis=-1)
    eps = 1e-12
    a_s = np.maximum(a, eps)
    e_s = np.maximum(e, eps)
    denom = a * e - b * b
    s = np.where(denom > eps,
                 np.clip((b * f - c * e) / np.maximum(denom, eps), 0.0, 1.0),
                 0.0)
    t = np.clip((b * s + f) / e_s, 0.0, 1.0)
    # re-clamp s against the clamped t (Ericson 5.1.9 final projection)
    s = np.clip((b * t - c) / a_s, 0.0, 1.0)
    pa = a0 + s[..., None] * d1
    pb = b0 + t[..., None] * d2
    return np.linalg.norm(pa - pb, axis=-1)


def min_pair_clearance(trajectory: np.ndarray) -> np.ndarray:
    """Per-pair capsule clearance (surface distance), (N, 7) -> (N, P).

    Negative entries are self-collisions.
    """
    # pure-numpy FK: this runs inside host-side rejection/validation loops,
    # where eager jnp ops on a remote (tunneled) backend are one remote
    # dispatch EACH (verify skill gotcha; cost measured in round 5's corpus
    # generator)
    from edmp_tpu.robot.kinematics import numpy_link_box_frames

    R, p = numpy_link_box_frames(np.asarray(trajectory, np.float64))
    a0, a1 = capsule_endpoints(R, p)                      # (N, 9, 3)
    d = segment_distance(a0[:, _PI], a1[:, _PI], a0[:, _PJ], a1[:, _PJ])
    return d - (CAPSULE_RADIUS[_PI] + CAPSULE_RADIUS[_PJ])[None, :]


def self_collision_free(trajectory: np.ndarray) -> bool:
    """True iff no capsule pair interpenetrates anywhere on the trajectory."""
    return bool(np.all(min_pair_clearance(trajectory) > 0.0))
