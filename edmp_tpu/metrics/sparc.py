"""Spectral Arc Length (SPARC) smoothness metric.

Implementation of the SPARC algorithm (Balasubramanian et al., 2015,
"On the analysis of movement smoothness"): the negative arc length of the
normalised magnitude spectrum of a speed profile, band-limited by an adaptive
amplitude-threshold cutoff.  Matches the semantics of the vendored metric the
reference evaluates (mpinets/third_party/sparc.py:49-128,
lib/metrics.py:47-126): padlevel zero-padding, max frequency cutoff fc,
amplitude threshold amp_th.
"""

from __future__ import annotations

import numpy as np


def sparc(speed_profile: np.ndarray, fs: float, padlevel: int = 4,
          fc: float = 10.0, amp_th: float = 0.05):
    """Smoothness of a 1-D speed profile (more negative = less smooth).

    Returns (sal, (freqs, magnitude), (sel_freqs, sel_magnitude)).
    """
    v = np.asarray(speed_profile, dtype=np.float64)
    if v.ndim != 1:
        raise ValueError("speed profile must be 1-D")
    nfft = int(2 ** (np.ceil(np.log2(len(v))) + padlevel))
    f = np.arange(0, fs, fs / nfft)
    Mf = np.abs(np.fft.fft(v, nfft))
    Mf = Mf / Mf.max() if Mf.max() > 0 else Mf

    fc_idx = (f <= fc).nonzero()[0]
    f_sel, Mf_sel = f[fc_idx], Mf[fc_idx]

    above = (Mf_sel >= amp_th).nonzero()[0]
    if len(above) == 0:
        return 0.0, (f, Mf), (f_sel, Mf_sel)
    lo, hi = above[0], above[-1]
    f_sel = f_sel[lo:hi + 1]
    Mf_sel = Mf_sel[lo:hi + 1]

    if len(f_sel) < 2 or f_sel[-1] == 0:
        return 0.0, (f, Mf), (f_sel, Mf_sel)
    df = np.diff(f_sel / f_sel[-1])
    dM = np.diff(Mf_sel)
    sal = -np.sum(np.sqrt(df ** 2 + dM ** 2))
    return float(sal), (f, Mf), (f_sel, Mf_sel)


def speed_profiles(trajectory: np.ndarray, dt: float):
    """Joint-space and end-effector speed profiles of an (N, 7) trajectory.

    Mirrors lib/metrics.py:11-31: joint speed = ||dq/dt||, EE speed =
    ||dp/dt|| via the 10-frame FK.
    """
    import jax.numpy as jnp

    from edmp_tpu.robot.kinematics import ee_transform

    traj = np.asarray(trajectory, np.float64)
    qd = np.diff(traj, axis=0) / dt
    joint_speed = np.linalg.norm(qd, axis=1)
    pos = np.asarray(ee_transform(jnp.asarray(traj, jnp.float32))[:, :3, 3])
    pd = np.diff(pos, axis=0) / dt
    ee_speed = np.linalg.norm(pd, axis=1)
    return joint_speed, ee_speed


def smoothness_metric(trajectory: np.ndarray, dt: float = 0.08):
    """(joint SPARC, EE SPARC) of one trajectory (lib/metrics.py:11-31)."""
    js, es = speed_profiles(trajectory, dt)
    fs = 1.0 / dt
    return sparc(js, fs)[0], sparc(es, fs)[0]


def path_length_metric(trajectory: np.ndarray):
    """(joint path length, EE path length) (lib/metrics.py:33-45)."""
    import jax.numpy as jnp

    from edmp_tpu.robot.kinematics import ee_transform

    traj = np.asarray(trajectory, np.float64)
    joint_len = float(np.sum(np.linalg.norm(np.diff(traj, axis=0), axis=1)))
    pos = np.asarray(ee_transform(jnp.asarray(traj, jnp.float32))[:, :3, 3])
    ee_len = float(np.sum(np.linalg.norm(np.diff(pos, axis=0), axis=1)))
    return joint_len, ee_len
