"""The analytic FLOP model vs XLA's own cost analysis (CPU backend).

bench.py derives tflops_per_sec / mfu_pct from utils/flops.py when the
tunneled backend makes compiled.cost_analysis() impractical; this pins the
analytic count to XLA's within a modest factor so the MFU numbers are
auditable."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edmp_tpu.models import temporal_unet as tu
from edmp_tpu.utils.flops import unet_forward_flops


def _xla_flops(fn, *args):
    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    if not ca or not ca.get("flops"):
        pytest.skip("cost_analysis unavailable on this backend")
    return float(ca["flops"])


def test_unet_flops_matches_xla():
    model = tu.create_model()
    params = jax.tree.map(jnp.asarray, tu.host_init_params(model, 50))
    x = jnp.zeros((16, 50, 7), jnp.float32)
    t = jnp.ones((1,), jnp.float32)
    got = _xla_flops(lambda p, x, t: model.apply({"params": p}, x, t),
                     params, x, t)
    want = unet_forward_flops(16)
    # XLA counts fused elementwise ops too; the conv pyramid dominates and
    # the analytic model counts exact valid taps, so agreement is tight
    assert want == pytest.approx(got, rel=0.10), (want, got)


def test_unet_flops_scale_linearly_in_batch():
    f1 = unet_forward_flops(1)
    f120 = unet_forward_flops(120)
    # the (1,)-shaped time-embedding MLP is batch-independent
    assert f120 == pytest.approx(120 * f1, rel=1e-3)
    assert 1e8 < f1 < 1e9  # ~0.2 GFLOP per sample forward
