"""Pin the self-collision screen's structural-exclusion set to ground truth.

The screen (metrics/evaluator.py) excludes link-box pairs whose conservative
boxes overlap across the reachable space regardless of configuration; this
test recomputes overlap frequencies over a deterministic config corpus so the
exclusion set cannot silently drift if the link boxes change."""

import numpy as np

from edmp_tpu import constants as C
from edmp_tpu.metrics import evaluator as EV
from edmp_tpu.validation.oracle import _obbs_overlap


def _overlap_freqs(n_configs=300, seed=0):
    import jax.numpy as jnp

    from edmp_tpu.robot.kinematics import link_box_frames

    r = np.random.default_rng(seed)
    lo, hi = np.asarray(C.FRANKA_LOWER), np.asarray(C.FRANKA_UPPER)
    q = lo + r.uniform(0, 1, (n_configs, 7)) * (hi - lo)
    R, p = link_box_frames(jnp.asarray(q, jnp.float32))
    R, p = np.asarray(R), np.asarray(p)
    h = np.asarray(C.LINK_BOX_DIMS) / 2.0
    freqs = {}
    for i in range(9):
        for j in range(i + 2, 9):
            hits = sum(
                _obbs_overlap(R[n, i], p[n, i], h[i], R[n, j], p[n, j], h[j])
                for n in range(n_configs))
            freqs[(i, j)] = hits / n_configs
    return freqs


def test_structural_exclusions_are_structural():
    freqs = _overlap_freqs()
    # excluded pairs really do overlap for a large share of random configs —
    # keeping them in the screen would fail nearly every trajectory
    for pair in EV._STRUCTURAL:
        assert freqs[pair] > 0.25, (pair, freqs[pair])
    # the artifact pair overlaps rarely but nonzero (conservative finger box
    # grazing the forearm box); if this drifts above structural levels or to
    # zero, the classification must be revisited
    for pair in EV._BOX_ARTIFACT:
        assert 0.005 < freqs[pair] < 0.25, (pair, freqs[pair])
    # the hand/finger cluster (>=6, >=6) shares one rigid frame, so its
    # overlap state is configuration-INDEPENDENT (frequency exactly 0 or 1)
    # — excluded because rigid bodies cannot collide by motion
    for i in range(6, 9):
        for j in range(i + 2, 9):
            assert freqs[(i, j)] in (0.0, 1.0), ((i, j), freqs[(i, j)])


def test_screened_pairs_rarely_overlap():
    freqs = _overlap_freqs()
    for pair in EV._SELF_PAIRS:
        # screened pairs must be informative: overlap on at most a modest
        # fraction of random configs (true self-collisions ARE possible)
        assert freqs[pair] < 0.25, (pair, freqs[pair])


def test_screen_passes_home_config():
    home = np.array([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785])
    traj = np.tile(home, (5, 1))
    assert EV.self_collision_free(traj)
