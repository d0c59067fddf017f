"""Target-region protocol check on typed primitive-volume rows.

The reference's paper-grade success requires the final EE position to lie
INSIDE the problem's ``target_volume`` and OUTSIDE every (corrected)
``target_negative_volume`` (mpinets/metrics.py:388-407, AND-ed into success
at :533-542) — e.g. reaching into the right drawer of a dresser, not a pose
merely within 1 cm of the handle.  Volumes arrive as typed (11,) rows packed
by :mod:`edmp_tpu.data.problems` (``[type, center, quat_xyzw, p0..p2]``).

Host-side numpy: the check evaluates ONE point per trajectory, so there is
nothing to ship to the device.
"""

from __future__ import annotations

import numpy as np

from edmp_tpu.costs.obstacles import _quat_xyzw_to_matrix
from edmp_tpu.data.problems import (VOLUME_CUBOID, VOLUME_CYLINDER,
                                    VOLUME_NONE, VOLUME_SPHERE)


def volume_sdf(point: np.ndarray, row: np.ndarray) -> float:
    """Signed distance of ``point`` (3,) to one typed volume row (11,).

    Exact primitive SDFs matching geometrout's (and costs/sdf.py's)
    conventions: negative inside, positive outside.  Type 0 (absent) returns
    +inf so absent rows never classify a point as inside.
    """
    row = np.asarray(row, np.float64)
    vtype = int(round(row[0]))
    if vtype == VOLUME_NONE:
        return np.inf
    center, quat, p = row[1:4], row[4:8], row[8:11]
    local = _quat_xyzw_to_matrix(quat).T @ (np.asarray(point, np.float64) - center)
    if vtype == VOLUME_CUBOID:
        q = np.abs(local) - p / 2.0
        return float(np.linalg.norm(np.maximum(q, 0.0))
                     + min(np.max(q), 0.0))
    if vtype == VOLUME_CYLINDER:
        dr = np.hypot(local[0], local[1]) - p[0]
        dz = abs(local[2]) - p[1] / 2.0
        out = np.hypot(max(dr, 0.0), max(dz, 0.0))
        return float(out + min(max(dr, dz), 0.0))
    if vtype == VOLUME_SPHERE:
        return float(np.linalg.norm(local) - p[0])
    raise ValueError(f"unknown volume type {vtype}")


def check_final_region(final_position: np.ndarray,
                       target_volume: np.ndarray,
                       negative_volumes: np.ndarray,
                       target_position: np.ndarray) -> bool:
    """mpinets/metrics.py:388-407 with the :530-534 negative-volume
    correction: negatives that contain the TARGET itself are dropped as bad
    data ("Sometimes the target is inside a negative volume"), then the final
    pose must satisfy sdf(target_volume) <= 0 and sdf(neg) > 0 for the rest.

    ``negative_volumes`` (m, 11) may include absent (type-0) padding rows —
    their sdf is +inf, which both passes the correction filter and the
    outside check, so padding is harmless.
    """
    if int(round(np.asarray(target_volume).reshape(-1)[0])) == VOLUME_NONE:
        return True  # no region specified (pre-region data); caller flags it
    if volume_sdf(final_position, target_volume) > 0:
        return False
    for row in np.asarray(negative_volumes).reshape(-1, 11):
        if volume_sdf(target_position, row) > 0 \
                and volume_sdf(final_position, row) <= 0:
            return False
    return True


def has_region(target_volume: np.ndarray) -> bool:
    return int(round(np.asarray(target_volume).reshape(-1)[0])) != VOLUME_NONE
