"""On-device (real TPU) numerical parity checks.

The pytest suite pins JAX_PLATFORMS=cpu (tests/conftest.py), so kernel
numerics on the actual accelerator are checked here instead:

  * fused Pallas Conv1dBlock vs the XLA reference math (the GroupNorm
    membership matmuls run on the real MXU — this is what the
    precision=HIGHEST fix is for);
  * full TemporalUNet forward, use_pallas=True vs False, shared params;
  * guidance gradient, hand-derived kernel vs jax.grad, on-device.

Run:  python tools/tpu_parity_check.py   (uses the default backend; passes
trivially on CPU, meaningful on TPU).  Exits non-zero on failure.
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp


def check_conv_block(r):
    from edmp_tpu.models import pallas_blocks as PB

    worst = 0.0
    for (B, L, cin, cout) in [(4, 50, 32, 64), (8, 7, 128, 256),
                              (2, 2, 512, 512), (1, 25, 64, 128)]:
        x = jnp.asarray(r.normal(0, 1, (B, L, cin)), jnp.float32)
        w = jnp.asarray(r.normal(0, 0.2, (5, cin, cout)), jnp.float32)
        b = jnp.asarray(r.normal(0, 0.1, cout), jnp.float32)
        s = jnp.asarray(r.uniform(0.5, 1.5, cout), jnp.float32)
        bb = jnp.asarray(r.normal(0, 0.1, cout), jnp.float32)
        want = np.asarray(PB.conv1d_block_reference(x, w, b, s, bb))
        got = np.asarray(PB.conv1d_block(x, w, b, s, bb))
        worst = max(worst, float(np.abs(got - want).max()))
    print(f"conv1d_block on-device max abs diff: {worst:.2e}")
    assert worst < 5e-4, worst


def check_unet(r):
    from edmp_tpu.models import temporal_unet as tu

    model = tu.create_model()
    pmodel = tu.create_model(use_pallas=True)
    params = tu.host_init_params(model, traj_len=50, seed=0)
    params = jax.tree.map(jnp.asarray, params)
    x = jnp.asarray(r.normal(0, 1, (8, 50, 7)), jnp.float32)
    t = jnp.asarray([100.0])
    a = np.asarray(jax.jit(lambda p, x, t: model.apply(
        {"params": p}, x, t))(params, x, t))
    b = np.asarray(jax.jit(lambda p, x, t: pmodel.apply(
        {"params": p}, x, t))(params, x, t))
    d = float(np.abs(a - b).max())
    print(f"TemporalUNet use_pallas A/B max abs diff: {d:.2e}")
    assert d < 1e-3, d


def check_gradient(r):
    from edmp_tpu.config import pack_ensemble, reference_guide_configs
    from edmp_tpu.costs.grad_kernel import guidance_gradient_manual
    from edmp_tpu.costs.guide import guidance_gradient
    from edmp_tpu.costs.obstacles import obstacle_aabbs, pack_scene

    gp, _ = pack_ensemble(reference_guide_configs([1, 11]), 4, 255)
    oc = np.concatenate([r.uniform(-0.5, 0.5, (6, 3)),
                         np.tile([0, 0, 0, 1.0], (6, 1)),
                         r.uniform(0.1, 0.4, (6, 3))], axis=-1)
    scene = pack_scene(oc, max_obstacles=6)
    joints = jnp.asarray(r.uniform(-1.5, 1.5, (8, 48, 7)), jnp.float32)
    start = jnp.asarray(r.uniform(-1, 1, 7), jnp.float32)
    goal = jnp.asarray(r.uniform(-1, 1, 7), jnp.float32)
    lo, hi = obstacle_aabbs(scene, expansion=gp.expansion[:, 99],
                            clearance=gp.clearance[:, 99])
    a = np.asarray(jax.jit(guidance_gradient)(joints, start, goal, lo, hi,
                                              gp))
    b = np.asarray(jax.jit(guidance_gradient_manual)(joints, start, goal,
                                                     lo, hi, gp))
    d = float(np.abs(a - b).max())
    print(f"guidance gradient manual-vs-autodiff on-device diff: {d:.2e}")
    assert d < 1e-5, d


def main():
    print(f"backend: {jax.default_backend()} "
          f"({jax.devices()[0].device_kind})")
    r = np.random.default_rng(0)
    check_conv_block(r)
    check_unet(r)
    check_gradient(r)
    print("ALL ON-DEVICE PARITY CHECKS PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
