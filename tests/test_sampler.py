"""Sampler algebra tests: schedule values, posterior update, guidance gating,
endpoint conditioning, q-sample training batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edmp_tpu.costs.guide import GuideParams
from edmp_tpu.costs.obstacles import pack_scene
from edmp_tpu.diffusion import sampler as S
from edmp_tpu.diffusion.schedule import make_schedule


def test_schedule_matches_reference_formula():
    T = 255
    sch = make_schedule(T)
    beta = np.linspace(0, 0.02, T + 1)[1:]
    np.testing.assert_allclose(np.asarray(sch.beta), beta, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sch.alpha), 1 - beta, atol=1e-7)
    # reference: alpha_bar[t] = prod(alpha[:t]) over 1..T (diffusion.py:16)
    ab = np.array([np.prod((1 - beta)[:t]) for t in np.arange(T + 1)[1:]])
    np.testing.assert_allclose(np.asarray(sch.alpha_bar), ab, rtol=1e-5)


def test_clip_joints_limits():
    x = jnp.asarray([[10.0, -10, 0, -1, 0, 1, 0]])
    c = np.asarray(S.clip_joints(x))
    assert c[0, 0] == pytest.approx(166 * np.pi / 180)
    assert c[0, 1] == pytest.approx(-101 * np.pi / 180)
    assert c[0, 3] == pytest.approx(-1.0)


def _dummy_apply(params, x, t):
    return jnp.zeros_like(x)


def test_unguided_denoise_endpoints_and_shape():
    sch = make_schedule(16)
    start = jnp.ones(7) * 0.3
    goal = -jnp.ones(7) * 0.2
    x = S.denoise(_dummy_apply, None, sch, jax.random.key(1),
                  batch_size=3, traj_len=10, start=start, goal=goal)
    assert x.shape == (3, 10, 7)
    np.testing.assert_allclose(np.asarray(x[:, 0, :]), 0.3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x[:, -1, :]), -0.2, atol=1e-6)
    assert bool(jnp.all(jnp.isfinite(x)))


def test_guided_with_zero_scale_matches_unguided():
    """With guidance scale 0 the guided sampler must reproduce the unguided
    trajectory (same RNG layout; 1-ulp tolerance for the fused
    zero-gradient add)."""
    T, B, N = 12, 2, 8
    sch = make_schedule(T)
    scene = pack_scene(np.array([[0.5, 0, 0.5, 0, 0, 0, 1, 0.3, 0.3, 0.3]]))
    gp = GuideParams(
        clearance=jnp.zeros((B, T)), expansion=jnp.zeros((B, T)),
        guidance_method=jnp.zeros(B), grad_norm=jnp.zeros(B),
        guidance_schedule=jnp.zeros((B, T)),
    )
    start = jnp.zeros(7)
    goal = jnp.ones(7) * 0.1
    key = jax.random.key(7)
    xg = S.denoise_guided(_dummy_apply, None, sch, scene, gp, start, goal,
                          key, batch_size=B, traj_len=N)
    xu = S.denoise(_dummy_apply, None, sch, key, batch_size=B, traj_len=N,
                   start=start, goal=goal)
    np.testing.assert_allclose(np.asarray(xg), np.asarray(xu), atol=1e-6)


def test_guidance_pushes_away_from_obstacle():
    """A big obstacle between start and goal: guided samples should carry
    less swept volume than unguided ones."""
    from edmp_tpu.costs.guide import swept_cost_per_sample

    T, B, N = 40, 8, 12
    sch = make_schedule(T)
    scene = pack_scene(np.array([[0.45, 0.0, 0.55, 0, 0, 0, 1, 0.5, 0.9, 0.7]]))
    gp = GuideParams(
        clearance=jnp.full((B, T), 0.05), expansion=jnp.zeros((B, T)),
        guidance_method=jnp.zeros(B), grad_norm=jnp.zeros(B),
        guidance_schedule=jnp.full((B, T), 1.5),
    )
    start = jnp.zeros(7)
    goal = jnp.asarray([1.2, 0.8, 0.0, -1.2, 0.0, 1.5, 0.0])
    key = jax.random.key(3)
    xg = S.denoise_guided(_dummy_apply, None, sch, scene, gp, start, goal,
                          key, batch_size=B, traj_len=N)
    x0 = S.denoise(_dummy_apply, None, sch, key, batch_size=B, traj_len=N,
                   start=start, goal=goal)
    cg = float(jnp.mean(swept_cost_per_sample(xg[:, 1:-1], start, goal, scene)))
    cu = float(jnp.mean(swept_cost_per_sample(x0[:, 1:-1], start, goal, scene)))
    assert cg < cu


def test_guided_zero_gradient_scene_is_nan_free():
    """Regression: a scene the batch never touches gives ||g|| = 0; the
    whole-tensor grad-norm blend must not NaN-poison the batch via 0*(g/0)
    (guard in _make_lane_guided_update / guidance_gradient_*)."""
    T, B, N = 12, 3, 8
    sch = make_schedule(T)
    # obstacle far outside the reachable workspace -> identically-zero cost
    scene = pack_scene(np.array([[9.0, 9, 9, 0, 0, 0, 1, 0.1, 0.1, 0.1]]))
    gp = GuideParams(
        clearance=jnp.zeros((B, T)), expansion=jnp.zeros((B, T)),
        guidance_method=jnp.zeros(B), grad_norm=jnp.ones(B),  # norm path ON
        guidance_schedule=jnp.full((B, T), 0.1),
    )
    x = S.denoise_guided(_dummy_apply, None, sch, scene, gp, jnp.zeros(7),
                         jnp.ones(7) * 0.1, jax.random.key(2),
                         batch_size=B, traj_len=N)
    assert bool(jnp.all(jnp.isfinite(x)))


def test_ddim_guidance_period_zero_disables_guidance():
    """guidance_period <= 0 must skip every guided update (the bench
    --no-guidance A/B for the DDIM path)."""
    T, B, N = 16, 2, 8
    sch = make_schedule(T)
    scene = pack_scene(np.array([[0.45, 0, 0.55, 0, 0, 0, 1, 0.5, 0.9, 0.7]]))
    base = dict(clearance=jnp.zeros((B, T)), expansion=jnp.zeros((B, T)),
                guidance_method=jnp.zeros(B), grad_norm=jnp.zeros(B))
    start, goal = jnp.zeros(7), jnp.ones(7) * 0.2
    key = jax.random.key(4)
    on = S.denoise_guided_ddim(
        _dummy_apply, None, sch, scene,
        GuideParams(**base, guidance_schedule=jnp.full((B, T), 2.0)),
        start, goal, key, batch_size=B, traj_len=N, num_steps=8,
        guidance_period=1)
    off = S.denoise_guided_ddim(
        _dummy_apply, None, sch, scene,
        GuideParams(**base, guidance_schedule=jnp.full((B, T), 2.0)),
        start, goal, key, batch_size=B, traj_len=N, num_steps=8,
        guidance_period=0)
    zero_scale = S.denoise_guided_ddim(
        _dummy_apply, None, sch, scene,
        GuideParams(**base, guidance_schedule=jnp.zeros((B, T))),
        start, goal, key, batch_size=B, traj_len=N, num_steps=8,
        guidance_period=1)
    # period-0 == guidance absent; with a live scale they must differ
    np.testing.assert_allclose(np.asarray(off), np.asarray(zero_scale),
                               atol=1e-6)
    assert np.abs(np.asarray(on) - np.asarray(off)).max() > 1e-4


def test_q_sample_conditioning_and_stats(rng):
    sch = make_schedule(255)
    x0 = jnp.asarray(rng.normal(0, 0.5, (64, 20, 7)), jnp.float32)
    xt, eps, t = S.generate_q_sample(sch, x0, jax.random.key(0))
    assert xt.shape == x0.shape and eps.shape == x0.shape and t.shape == (64,)
    assert int(jnp.min(t)) >= 1 and int(jnp.max(t)) <= 255
    np.testing.assert_array_equal(np.asarray(xt[:, 0, :]), np.asarray(x0[:, 0, :]))
    np.testing.assert_array_equal(np.asarray(xt[:, -1, :]), np.asarray(x0[:, -1, :]))
    # closed form: xt = sqrt(ab) x0 + sqrt(1-ab) eps at interior points
    ab = np.asarray(sch.alpha_bar)[np.asarray(t) - 1][:, None, None]
    want = np.sqrt(ab) * np.asarray(x0) + np.sqrt(1 - ab) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(xt[:, 1:-1]), want[:, 1:-1], atol=1e-5)


def test_denoise_guided_is_jittable():
    T, B, N = 6, 2, 8
    sch = make_schedule(T)
    scene = pack_scene(np.array([[0.5, 0, 0.5, 0, 0, 0, 1, 0.2, 0.2, 0.2]]))
    gp = GuideParams(
        clearance=jnp.zeros((B, T)), expansion=jnp.zeros((B, T)),
        guidance_method=jnp.asarray([0.0, 1.0]), grad_norm=jnp.zeros(B),
        guidance_schedule=jnp.full((B, T), 0.5),
    )

    @jax.jit
    def run(key):
        return S.denoise_guided(_dummy_apply, None, sch, scene, gp,
                                jnp.zeros(7), jnp.ones(7) * 0.2, key,
                                batch_size=B, traj_len=N)

    x = run(jax.random.key(0))
    assert x.shape == (B, N, 7)
    assert bool(jnp.all(jnp.isfinite(x)))


def test_denoise_guided_golden_trace():
    """Fixed-seed regression trace: protects the sampler's reproduced
    reference quirks (beta*z noise, cadence, clip-for-guide-only, per-sample
    schedules) against accidental semantic drift.  Regenerate the constants
    ONLY for intentional semantics changes."""
    from edmp_tpu.models import temporal_unet as tu

    T, B, N = 20, 3, 10
    model = tu.TemporalUNet(input_dim=7, time_dim=8, dims=(8, 16))
    params = tu.host_init_params(model, traj_len=N, seed=42)
    sch = make_schedule(T)
    scene = pack_scene(
        np.array([[0.45, 0.0, 0.55, 0, 0, 0, 1, 0.4, 0.6, 0.5]]))
    gp = GuideParams(
        clearance=jnp.full((B, T), 0.05), expansion=jnp.full((B, T), 0.1),
        guidance_method=jnp.asarray([0.0, 1.0, 0.0]),
        grad_norm=jnp.asarray([0.0, 0.0, 1.0]),
        guidance_schedule=jnp.full((B, T), 0.8),
    )

    def apply_fn(p, x, t):
        return model.apply({"params": p}, x, t)

    x = np.asarray(S.denoise_guided(
        apply_fn, params, sch, scene, gp, jnp.zeros(7), jnp.ones(7) * 0.3,
        jax.random.key(123), batch_size=B, traj_len=N))
    assert float(x.sum()) == pytest.approx(9.488982, abs=2e-3)
    assert float(np.abs(x).sum()) == pytest.approx(172.632202, abs=2e-2)
    np.testing.assert_allclose(
        x[1, 4], [1.21918, -1.338883, -0.02105, -0.633211, -1.016932,
                  1.016012, 2.747002], atol=1e-4)
    np.testing.assert_allclose(
        x[2, 7], [0.128895, -2.598097, 0.594288, -0.921487, -0.469825,
                  -1.639527, 0.456857], atol=1e-4)


def test_ddim_sampler_shapes_and_guidance():
    """DDIM accelerated mode: correct shapes, endpoints pinned, guidance
    reduces swept volume like the full sampler."""
    from edmp_tpu.costs.guide import swept_cost_per_sample

    T, B, N = 40, 6, 12
    sch = make_schedule(T)
    scene = pack_scene(np.array([[0.45, 0.0, 0.55, 0, 0, 0, 1, 0.5, 0.9, 0.7]]))
    start = jnp.zeros(7)
    goal = jnp.asarray([1.2, 0.8, 0.0, -1.2, 0.0, 1.5, 0.0])
    on = GuideParams(
        clearance=jnp.full((B, T), 0.05), expansion=jnp.zeros((B, T)),
        guidance_method=jnp.zeros(B), grad_norm=jnp.zeros(B),
        guidance_schedule=jnp.full((B, T), 1.5))
    off = on._replace(guidance_schedule=jnp.zeros((B, T)))
    key = jax.random.key(5)
    xs = {}
    for tag, gp in (("on", on), ("off", off)):
        x = S.denoise_guided_ddim(_dummy_apply, None, sch, scene, gp,
                                  start, goal, key, batch_size=B,
                                  traj_len=N, num_steps=8)
        assert x.shape == (B, N, 7)
        np.testing.assert_allclose(np.asarray(x[:, 0]), 0.0, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(x[:, -1]),
            np.broadcast_to(np.asarray(goal), (B, 7)), atol=1e-5)
        xs[tag] = x
    c_on = float(jnp.mean(swept_cost_per_sample(xs["on"][:, 1:-1], start, goal, scene)))
    c_off = float(jnp.mean(swept_cost_per_sample(xs["off"][:, 1:-1], start, goal, scene)))
    assert c_on < c_off


def test_planner_ddim_mode(rng):
    from edmp_tpu import planner as P
    from edmp_tpu.config import GuideConfig, pack_ensemble
    from edmp_tpu.data import synthetic
    from edmp_tpu.models import temporal_unet as tu

    T, N = 16, 12
    model = tu.TemporalUNet(input_dim=7, time_dim=8, dims=(8, 16))
    params = tu.init_params(jax.random.key(0), model, traj_len=N)
    sch = make_schedule(T)
    seg = (((0, 8), (0.0, 0.0)), ((8, 12), (0.0, 0.0)), ((12, 16), (0.0, 0.0)))
    gcfg = GuideConfig((0.05, 0.05), seg, "sv", False, "constant", 0.2, 8e-4)
    gp, _ = pack_ensemble([gcfg], batch_per_guide=2, T=T)
    cfg = P.PlannerConfig(batch_size=2, traj_len=N, sampler="ddim",
                          ddim_steps=6)
    oc, st, gl, va = synthetic.random_problem(rng)
    from edmp_tpu.costs.obstacles import pack_scene as ps

    fn = P.make_plan_fn(model, sch, cfg)
    res = fn(params, ps(oc), gp, jnp.asarray(st, jnp.float32),
             jnp.asarray(gl, jnp.float32), jnp.asarray(va), jax.random.key(0))
    assert res.best.shape == (N, 7)
    assert bool(jnp.all(jnp.isfinite(res.trajectories)))
