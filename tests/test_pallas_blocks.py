"""Pallas fused Conv1dBlock: interpret-mode equivalence with the jnp/Flax
reference math."""

import numpy as np

import jax
import jax.numpy as jnp

from edmp_tpu.models import pallas_blocks as PB
from edmp_tpu.models import temporal_unet as tu


def _random_params(rng, k, cin, cout):
    return (jnp.asarray(rng.normal(0, 0.2, (k, cin, cout)), jnp.float32),
            jnp.asarray(rng.normal(0, 0.1, cout), jnp.float32),
            jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32),
            jnp.asarray(rng.normal(0, 0.1, cout), jnp.float32))


def test_fused_block_matches_reference(rng):
    B, L, Cin, Cout = 3, 50, 16, 32
    x = jnp.asarray(rng.normal(0, 1, (B, L, Cin)), jnp.float32)
    w, b, s, bb = _random_params(rng, 5, Cin, Cout)
    want = PB.conv1d_block_reference(x, w, b, s, bb)
    got = PB.conv1d_block(x, w, b, s, bb, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_block_matches_flax_module(rng):
    """Against the actual Flax Conv1dBlock with the same parameters."""
    B, L, C = 2, 12, 16
    x = jnp.asarray(rng.normal(0, 1, (B, L, 8)), jnp.float32)
    blk = tu.Conv1dBlock(features=C, kernel_size=5)
    params = blk.init(jax.random.key(0), x)["params"]
    want = blk.apply({"params": params}, x)
    got = PB.conv1d_block(
        x, params["conv"]["kernel"], params["conv"]["bias"],
        params["norm"]["scale"], params["norm"]["bias"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_block_odd_lengths(rng):
    for L in (7, 13, 25):
        x = jnp.asarray(rng.normal(0, 1, (1, L, 8)), jnp.float32)
        w, b, s, bb = _random_params(rng, 5, 8, 16)
        want = PB.conv1d_block_reference(x, w, b, s, bb)
        got = PB.conv1d_block(x, w, b, s, bb, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


def test_fused_block_tiny_lengths(rng):
    """L in {2, 3, 4} — the bottom-of-UNet horizons that motivated the
    fixed-length tap slicing (50 -> 25 -> 13 -> 7 -> 4 -> 2)."""
    for L in (2, 3, 4):
        x = jnp.asarray(rng.normal(0, 1, (2, L, 8)), jnp.float32)
        w, b, s, bb = _random_params(rng, 5, 8, 16)
        want = PB.conv1d_block_reference(x, w, b, s, bb)
        got = PB.conv1d_block(x, w, b, s, bb, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


def test_flax_use_pallas_param_interchange(rng):
    """Conv1dBlock(use_pallas=True) applied with params initialised by the
    XLA-path block: same tree, same output (the checkpoint-interchange
    guarantee the module docstring makes)."""
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 8)), jnp.float32)
    xla_blk = tu.Conv1dBlock(features=16, kernel_size=5)
    params = xla_blk.init(jax.random.key(0), x)["params"]
    pl_blk = tu.Conv1dBlock(features=16, kernel_size=5, use_pallas=True)
    assert jax.tree.structure(pl_blk.init(jax.random.key(1), x)["params"]) \
        == jax.tree.structure(params)
    want = xla_blk.apply({"params": params}, x)
    got = pl_blk.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_large_mean_variance_stability(rng):
    """|mean| >> std input: the single-pass E[x^2]-E[x]^2 form loses ~1e-2
    here; the two-pass centred variance must stay tight and finite."""
    x = jnp.asarray(300.0 + rng.normal(0, 0.05, (1, 16, 8)), jnp.float32)
    w, b, s, bb = _random_params(rng, 5, 8, 16)
    want = PB.conv1d_block_reference(x, w, b, s, bb)
    got = PB.conv1d_block(x, w, b, s, bb, interpret=True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3,
                               rtol=1e-3)
