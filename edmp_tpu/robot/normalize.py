"""Joint-angle normalisation to/from [-1, 1] by the Franka limits.

Counterpart of mpinets/utils.py:30-244 (normalize/unnormalize_franka_joints),
batched over arbitrary leading dims, numpy or JAX arrays in, same type out.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from edmp_tpu import constants as C

_LO = C.FRANKA_LOWER
_HI = C.FRANKA_UPPER


def normalize_joints(q, limits=(-1.0, 1.0)):
    """(..., 7) joint angles -> [limits[0], limits[1]] box."""
    xp = jnp if isinstance(q, jnp.ndarray) else np
    lo = xp.asarray(_LO, dtype=q.dtype if hasattr(q, "dtype") else None)
    hi = xp.asarray(_HI, dtype=q.dtype if hasattr(q, "dtype") else None)
    unit = (xp.asarray(q) - lo) / (hi - lo)
    return unit * (limits[1] - limits[0]) + limits[0]


def unnormalize_joints(x, limits=(-1.0, 1.0)):
    """Inverse of normalize_joints."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    lo = xp.asarray(_LO, dtype=x.dtype if hasattr(x, "dtype") else None)
    hi = xp.asarray(_HI, dtype=x.dtype if hasattr(x, "dtype") else None)
    unit = (xp.asarray(x) - limits[0]) / (limits[1] - limits[0])
    return unit * (hi - lo) + lo
