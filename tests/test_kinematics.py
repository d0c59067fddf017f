"""FK unit tests: cross-checks between the batched JAX chain, the float64
numpy chain, and hand-computable configurations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edmp_tpu import constants as C
from edmp_tpu.robot import kinematics as kin


def test_ee_transform_zero_config():
    """At q=0 the EE position is analytically derivable from the DH table."""
    T = kin.numpy_ee_transform(np.zeros(7))
    # x: a4 cancels a5; a7=0.088 remains on x after the alternating alphas.
    # Known Panda flange+TCP pose at zero config:
    assert T[2, 3] == pytest.approx(0.333 + 0.316 + 0.384 - 0.107 - 0.1034, abs=1e-9)
    assert T[0, 3] == pytest.approx(0.088, abs=1e-9)
    assert T[1, 3] == pytest.approx(0.0, abs=1e-9)
    # Rotation: gripper z axis points down (-z) at zero config.
    assert T[2, 2] == pytest.approx(-1.0, abs=1e-9)


def test_jax_matches_numpy_reference(rng):
    qs = rng.uniform(C.FRANKA_LOWER, C.FRANKA_UPPER, size=(32, 7))
    T_jax = np.asarray(kin.ee_transform(jnp.asarray(qs, jnp.float32)))
    for i in range(32):
        T_np = kin.numpy_ee_transform(qs[i])
        np.testing.assert_allclose(T_jax[i], T_np, atol=2e-5)


def test_joint_frames_shapes_and_hand_sharing(rng):
    qs = jnp.asarray(rng.standard_normal((4, 5, 7)), jnp.float32)
    R, p = kin.joint_frames(qs)
    assert R.shape == (4, 5, 9, 3, 3)
    assert p.shape == (4, 5, 9, 3)
    # hand (7) and finger (8) anchors equal joint-7 frame (lib/guide.py:93-96)
    np.testing.assert_array_equal(np.asarray(R[..., 7, :, :]), np.asarray(R[..., 6, :, :]))
    np.testing.assert_array_equal(np.asarray(p[..., 8, :]), np.asarray(p[..., 6, :]))


def test_link_aabbs_match_corner_enumeration(rng):
    """|R|·h AABB must equal min/max over the 8 transformed corners."""
    qs = jnp.asarray(rng.standard_normal((3, 2, 7)) * 0.7, jnp.float32)
    lo, hi = kin.link_aabbs(qs)
    R, p = kin.link_box_frames(qs)
    h = C.LINK_BOX_DIMS / 2.0
    corners = np.stack(np.meshgrid(*[[-1.0, 1.0]] * 3, indexing="ij"), -1).reshape(8, 3)
    pts = np.einsum("...lij,lcj->...lci", np.asarray(R), corners[None] * h[:, None, :])
    pts = pts + np.asarray(p)[..., None, :]
    np.testing.assert_allclose(np.asarray(lo), pts.min(axis=-2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hi), pts.max(axis=-2), atol=1e-5)


def test_fk_is_jittable_and_differentiable(rng):
    q = jnp.asarray(rng.standard_normal((2, 3, 7)), jnp.float32)

    @jax.jit
    def f(q):
        return jnp.sum(kin.fk_positions(q) ** 2)

    g = jax.grad(f)(q)
    assert g.shape == q.shape
    assert bool(jnp.all(jnp.isfinite(g)))


def test_link_frames_at_zero_config_heights():
    """Sanity: at q=0 link boxes sit at plausible heights along the arm."""
    _, p = kin.link_box_frames(jnp.zeros((1, 7), jnp.float32))
    z = np.asarray(p)[0, :, 2]
    # link1 box below joint1 (z=0.333), link5 below joint5 (z=0.333+0.316+0.384)
    assert 0.2 < z[0] < 0.35
    assert z[4] < 1.033
    # hand/finger near the top of the chain but below flange + offsets;
    # joint-7 z points downward at q=0, so the finger hangs below the hand.
    assert 0.8 < z[7] < 1.1
    assert z[8] < z[7]
