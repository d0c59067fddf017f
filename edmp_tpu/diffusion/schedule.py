"""DDPM variance schedule (linear, EDMP flavour).

Parity: ``diffusion/diffusion.py:37-49`` — beta = linspace(0, thresh, T+1)[1:]
(so beta[0] = thresh/T, beta[T-1] = thresh), alpha = 1-beta,
alpha_bar[t] = prod(alpha[:t+1]).  Note the reference's reverse update adds
``beta * z`` noise (NOT sqrt(beta-tilde)) — that quirk lives in the sampler.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    beta: jnp.ndarray       # (T,)
    alpha: jnp.ndarray      # (T,)
    alpha_bar: jnp.ndarray  # (T,)

    @property
    def T(self) -> int:
        return self.beta.shape[0]


def make_schedule(T: int, variance_thresh: float = 0.02,
                  dtype=jnp.float32) -> DiffusionSchedule:
    beta = np.linspace(0.0, variance_thresh, T + 1)[1:]
    alpha = 1.0 - beta
    alpha_bar = np.cumprod(alpha)
    return DiffusionSchedule(
        beta=jnp.asarray(beta, dtype),
        alpha=jnp.asarray(alpha, dtype),
        alpha_bar=jnp.asarray(alpha_bar, dtype),
    )
