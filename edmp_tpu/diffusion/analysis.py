"""Diffusion-analysis utilities.

Counterparts of the reference's Gaussian helpers and diagnostic chains
(diffusion/gaussian.py; diffusion/diffusion.py:51-77,137-199): KL divergence
of samples against N(0, I), stepwise forward diffusion with KL tracking
(used by the authors to validate the schedule), and the deterministic
reverse chain.  Vectorised numpy/JAX — no matplotlib dependency.
"""

from __future__ import annotations

import numpy as np


from edmp_tpu.diffusion.schedule import DiffusionSchedule


def gaussian_pdf(x, mean=0.0, var=1.0):
    """N(mean, var) density (diffusion/gaussian.py:6-12)."""
    x = np.asarray(x)
    return np.exp(-0.5 * (x - mean) ** 2 / var) / np.sqrt(2 * np.pi * var)


def gaussian_plot_limits(mean, sigma, edge_factor: float = 0.01):
    """Bell-curve x-range where the density falls to ``edge_factor`` of the
    peak (diffusion/gaussian.py:37-46; used by the reference for plot axes).

    Returns (x_lo, x_hi)."""
    p_min = edge_factor * gaussian_pdf(mean, mean, sigma ** 2)
    half = sigma * np.sqrt(
        2.0 * np.log(1.0 / (p_min * sigma * np.sqrt(2.0 * np.pi))))
    return mean - half, mean + half


def multivariate_gaussian_pdf(mean, var, size: int = 1024,
                              limits=(-1.0, 1.0)):
    """Isotropic k-dim Gaussian density on a regular grid
    (diffusion/gaussian.py:48-69).

    mean: (k,); var: scalar variance shared by all axes.  Returns a
    k-dimensional (size, ..., size) array sampled over ``limits`` per axis.
    """
    mean = np.asarray(mean, np.float64)
    k = mean.size
    axes = np.repeat([np.linspace(limits[0], limits[1], size)], k, axis=0)
    x = np.array(np.meshgrid(*axes))
    mu = mean.reshape((k,) + (1,) * k)
    norm = 1.0 / (((2.0 * np.pi) ** (k / 2.0)) * np.sqrt(var ** k))
    return norm * np.exp(-0.5 * np.sum((x - mu) ** 2, axis=0) / var)


def kl_divergence_against_gaussian(samples, num_bins: int = 100) -> float:
    """Histogram KL(sample distribution || N(0,1))
    (diffusion/gaussian.py:21-35)."""
    x = np.asarray(samples, np.float64).ravel()
    lo, hi = x.min(), x.max()
    if hi <= lo:
        return float("inf")
    hist, edges = np.histogram(x, bins=num_bins, range=(lo, hi),
                               density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    q = gaussian_pdf(centers)
    mask = (hist > 0) & (q > 0)
    width = edges[1] - edges[0]
    return float(np.sum(hist[mask] * np.log(hist[mask] / q[mask])) * width)


def q_sample_step(schedule: DiffusionSchedule, x, t: int, eps):
    """One forward step q(x_t | x_{t-1}) (diffusion.py:51-77)."""
    a = np.asarray(schedule.alpha)[t - 1]
    return np.sqrt(a) * np.asarray(x) + np.sqrt(1 - a) * np.asarray(eps)


def forward_diffuse(schedule: DiffusionSchedule, x0, rng: np.random.Generator,
                    condition: bool = True):
    """Full forward chain with per-step KL diagnostics
    (diffusion.py:137-175).

    x0: (B, N, C).  Returns (chain (T+1, B, N, C), eps (T, B, N, C),
    kl (T, B is flattened -> per-step scalar)).
    """
    x0 = np.asarray(x0, np.float64)
    T = schedule.T
    chain = np.zeros((T + 1,) + x0.shape)
    chain[0] = x0
    eps = rng.standard_normal((T,) + x0.shape)
    kl = np.zeros(T)
    for t in range(1, T + 1):
        chain[t] = q_sample_step(schedule, chain[t - 1], t, eps[t - 1])
        if condition:
            chain[t][:, 0, :] = x0[:, 0, :]
            chain[t][:, -1, :] = x0[:, -1, :]
        kl[t - 1] = kl_divergence_against_gaussian(chain[t])
    return chain, eps, kl


def reverse_diffuse(schedule: DiffusionSchedule, xT, eps):
    """Deterministic reverse chain given the true noises
    (diffusion.py:177-199)."""
    xT = np.asarray(xT, np.float64)
    T = schedule.T
    alpha = np.asarray(schedule.alpha)
    chain = np.zeros((T + 1,) + xT.shape)
    chain[T] = xT
    for t in range(T, 0, -1):
        chain[t - 1] = (chain[t] - np.sqrt(1 - alpha[t - 1])
                        * np.asarray(eps[t - 1])) / np.sqrt(alpha[t - 1])
    return chain
