"""Pin the inscribed-capsule self-collision model (robot/self_collision.py).

The round-2 OBB screen needed structural exclusions — (4,6) forearm-wrist
overlapped for 96% of random configs, so it was excluded and the screen was
blind exactly where real self-collisions happen.  The capsule model screens
ALL pairs with >= 2 joints of relative motion and must stay informative:
no pair may flag a majority of random configs, and the previously-excluded
pairs must now be screened.  Frequencies are pinned over a deterministic
corpus so geometry changes cannot silently shift the screen
(docs/self_collision.md records the study)."""

import numpy as np
import pytest

from edmp_tpu import constants as C
from edmp_tpu.metrics import evaluator as EV
from edmp_tpu.robot import self_collision as SC

HOME = np.array([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785])


def _corpus(n=300, seed=0):
    r = np.random.default_rng(seed)
    lo, hi = np.asarray(C.FRANKA_LOWER), np.asarray(C.FRANKA_UPPER)
    return lo + r.uniform(0, 1, (n, 7)) * (hi - lo)


def test_no_structural_exclusions():
    """Every pair with >= 2 joints of relative motion is screened; the OBB
    screen's excluded pairs are back in."""
    pairs = set(SC.SELF_PAIRS)
    for p in [(4, 6), (4, 7), (4, 8)]:  # the old blind spots
        assert p in pairs
    # rigid hand/finger cluster (all on joint frame 7) and shared-joint
    # neighbours are kinematically excluded — by the frame-distance rule,
    # not a hand-maintained exclusion list
    lj = np.asarray(C.LINK_JOINT_FRAME)
    for i, j in pairs:
        assert lj[j] - lj[i] >= 2


def test_screen_is_informative():
    """No screened pair may be in collision for a majority of random
    configs (that was the OBB screen's structural failure mode)."""
    cl = SC.min_pair_clearance(_corpus())
    rates = (cl < 0).mean(axis=0)
    for pair, rate in zip(SC.SELF_PAIRS, rates):
        assert rate < 0.5, (pair, rate)
    # the forearm-wrist pair is the hardest; pin its measured band so
    # geometry drift is caught (0.25 at seed 0, n=300)
    i46 = SC.SELF_PAIRS.index((4, 6))
    assert 0.1 < rates[i46] < 0.45
    # overall: uniform-random 7-DoF configs DO self-collide a sizable
    # minority of the time; a near-zero rate would mean a blind screen
    flag_rate = (cl < 0).any(axis=1).mean()
    assert 0.15 < flag_rate < 0.6


def test_capsules_inscribed_in_boxes():
    """radius + half-length never exceeds the box half-extents (the model
    can only UNDER-approximate the conservative boxes)."""
    dims = np.asarray(C.LINK_BOX_DIMS)
    for l in range(9):
        ax = int(np.argmax(dims[l]))
        assert SC.CAPSULE_HALF_LEN[l] + SC.CAPSULE_RADIUS[l] \
            <= dims[l, ax] / 2.0 + 1e-12
        cross = [dims[l, k] / 2.0 for k in range(3) if k != ax]
        assert SC.CAPSULE_RADIUS[l] <= min(cross) + 1e-12


def test_home_and_smooth_trajectory_pass():
    assert SC.self_collision_free(np.tile(HOME, (5, 1)))
    # a gentle sweep around home stays clear
    t = np.linspace(0, 1, 20)[:, None]
    traj = HOME[None, :] + 0.3 * np.sin(np.pi * t) * np.ones((1, 7))
    assert SC.self_collision_free(traj)


def test_folded_wrist_flags():
    """Wrist folded fully back toward the forearm (q5 at its upper limit,
    elbow bent): the capsule model must flag what the OBB screen was blind
    to.  Config found by maximizing (4,6) penetration over the corpus."""
    cl = SC.min_pair_clearance(_corpus())
    worst = int(np.argmin(cl[:, SC.SELF_PAIRS.index((4, 6))]))
    q = _corpus()[worst]
    assert not SC.self_collision_free(q[None])
    # and the flip is driven by a genuine negative clearance, not epsilon
    assert cl[worst, SC.SELF_PAIRS.index((4, 6))] < -0.01


def test_segment_distance_ground_truth():
    sd = SC.segment_distance
    z = np.zeros(3)
    # parallel unit segments 1 apart
    assert sd(z, np.array([1.0, 0, 0]),
              np.array([0.0, 1.0, 0]), np.array([1.0, 1.0, 0])) \
        == pytest.approx(1.0)
    # crossing skew segments: distance between midpoints' z-gap
    assert sd(np.array([-1.0, 0, 0]), np.array([1.0, 0, 0]),
              np.array([0.0, -1.0, 0.5]), np.array([0.0, 1.0, 0.5])) \
        == pytest.approx(0.5)
    # endpoint-to-endpoint case (clamping active)
    assert sd(z, np.array([1.0, 0, 0]),
              np.array([3.0, 0, 0]), np.array([4.0, 0, 0])) \
        == pytest.approx(2.0)
    # degenerate: both segments are points
    assert sd(z, z, np.array([0.0, 3.0, 4.0]), np.array([0.0, 3.0, 4.0])) \
        == pytest.approx(5.0)
    # intersecting segments
    assert sd(np.array([-1.0, 0, 0]), np.array([1.0, 0, 0]),
              np.array([0.0, -1.0, 0]), np.array([0.0, 1.0, 0])) \
        == pytest.approx(0.0, abs=1e-9)


def test_evaluator_uses_capsule_model():
    assert EV.self_collision_free is SC.self_collision_free