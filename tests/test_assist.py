"""Self-collision + joint-limit assist guidance (costs/assist.py).

Covers: JAX capsule clearances vs the numpy evaluator model, hinge-cost
gradients (finite differences), static elision of the assist branch, config
packing, sampler integration (assist measurably reduces the violations the
strict protocol penalizes, mpinets/metrics.py:278-291,334-345)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edmp_tpu import constants as C
from edmp_tpu.costs import assist as A
from edmp_tpu.costs.guide import GuideParams
from edmp_tpu.costs.obstacles import pack_scene
from edmp_tpu.diffusion import sampler as S
from edmp_tpu.diffusion.schedule import make_schedule
from edmp_tpu.robot.self_collision import min_pair_clearance


def _random_configs(rng, n):
    lo = np.asarray(C.JOINT_LIMITS_LOWER)
    hi = np.asarray(C.JOINT_LIMITS_UPPER)
    return lo + rng.uniform(0, 1, (n, 7)) * (hi - lo)


def test_capsule_clearances_match_numpy_model(rng):
    q = _random_configs(rng, 32).astype(np.float32)
    ours = np.asarray(A.capsule_clearances(jnp.asarray(q)))
    ref = min_pair_clearance(q)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_self_collision_cost_zero_when_clear(rng):
    # the home-ish configuration is self-collision free with margin to spare
    q = jnp.asarray([[0.0, -0.3, 0.0, -1.8, 0.0, 1.5, 0.0]], jnp.float32)
    assert float(A.self_collision_cost(q, margin=0.0)) == 0.0


def test_self_collision_cost_grad_finite_difference(rng):
    # pick a configuration with at least one pair inside the margin so the
    # hinge is active
    qs = _random_configs(rng, 256).astype(np.float64)
    cl = np.stack([min_pair_clearance(q[None]).min() for q in qs])
    idx = np.argmin(cl)
    q = jnp.asarray(qs[idx][None], jnp.float32)
    margin = float(cl[idx]) + 0.05  # hinge active at this configuration

    f = lambda x: A.self_collision_cost(x, margin=margin)
    g = np.asarray(jax.grad(f)(q))
    assert np.any(g != 0.0)
    eps = 1e-4
    for j in range(7):
        dq = np.zeros((1, 7), np.float32)
        dq[0, j] = eps
        fd = (float(f(q + dq)) - float(f(q - dq))) / (2 * eps)
        assert g[0, j] == pytest.approx(fd, rel=5e-2, abs=5e-4)


def test_joint_limit_cost_and_grad_direction():
    lo = np.asarray(C.JOINT_LIMITS_LOWER, np.float32)
    hi = np.asarray(C.JOINT_LIMITS_UPPER, np.float32)
    inside = jnp.asarray((lo + hi)[None] / 2)
    assert float(A.joint_limit_cost(inside)) == 0.0
    # violate joint 0 above and joint 1 below
    q = (lo + hi) / 2
    q[0] = hi[0] + 0.2
    q[1] = lo[1] - 0.3
    g = np.asarray(jax.grad(lambda x: A.joint_limit_cost(x))(
        jnp.asarray(q[None])))
    assert g[0, 0] > 0       # gradient descent pushes joint 0 down
    assert g[0, 1] < 0       # and joint 1 up
    assert np.all(g[0, 2:] == 0)


def test_has_assist_static_and_make_update():
    B, T = 4, 8
    base = dict(clearance=jnp.zeros((B, T)), expansion=jnp.zeros((B, T)),
                guidance_method=jnp.zeros(B), grad_norm=jnp.zeros(B),
                guidance_schedule=jnp.zeros((B, T)))
    off = GuideParams(**base)
    assert not A.has_assist(off)
    assert A.make_assist_update(off) is None
    on = GuideParams(**base, joint_limit_weight=jnp.full(B, 0.1))
    assert A.has_assist(on)
    assert A.make_assist_update(on) is not None
    # None leaves survive jit tracing (the static-elision contract)
    @jax.jit
    def probe(g):
        return jnp.asarray(0.0 if g.self_collision_weight is None else 1.0)
    assert float(probe(off)) == 0.0
    assert float(probe(on)) == 0.0


def test_pack_ensemble_assist_fields():
    from edmp_tpu.config import pack_ensemble, reference_guide_configs

    gcfgs = reference_guide_configs([1, 2])
    gp, _ = pack_ensemble(gcfgs, 3, T=16)
    assert gp.self_collision_weight is None
    assert gp.joint_limit_weight is None

    import dataclasses
    on = [dataclasses.replace(g, self_collision_weight=2.0,
                              joint_limit_weight=0.5) for g in gcfgs]
    gp2, _ = pack_ensemble(on, 3, T=16)
    np.testing.assert_allclose(np.asarray(gp2.self_collision_weight), 2.0)
    np.testing.assert_allclose(np.asarray(gp2.joint_limit_weight), 0.5)


def test_guide_yaml_roundtrip_assist(tmp_path):
    import yaml

    from edmp_tpu.config import GuideConfig, write_guide_yamls

    write_guide_yamls(str(tmp_path), [1])
    path = tmp_path / "cfgs" / "guide1.yaml"
    g = GuideConfig.from_yaml(str(path))
    assert g.self_collision_weight == 0.0  # absent key -> parity default
    doc = yaml.safe_load(path.read_text())
    doc["hyperparameters"]["self_collision_weight"] = 1.5
    doc["hyperparameters"]["joint_limit_weight"] = 0.25
    path.write_text(yaml.safe_dump(doc))
    g2 = GuideConfig.from_yaml(str(path))
    assert g2.self_collision_weight == 1.5
    assert g2.joint_limit_weight == 0.25


def _dummy_apply(params, x, t):
    return jnp.zeros_like(x)


def test_sampler_jl_assist_reduces_limit_violation():
    """Without assist the emitted trajectory can sit outside the joint
    limits (the clip is never written back, diffusion.py:328-341); the
    joint-limit hinge must pull it back in."""
    T, B, N = 40, 4, 12
    sch = make_schedule(T)
    scene = pack_scene(np.array([[0.5, 0, 0.5, 0, 0, 0, 1, 0.2, 0.2, 0.2]]))
    base = dict(clearance=jnp.zeros((B, T)), expansion=jnp.zeros((B, T)),
                guidance_method=jnp.zeros(B), grad_norm=jnp.zeros(B),
                guidance_schedule=jnp.zeros((B, T)))
    # start/goal AT a joint limit: the posterior noise pushes samples past it
    goal = np.zeros(7, np.float32)
    goal[5] = float(C.JOINT_LIMITS_UPPER[5])
    start = np.zeros(7, np.float32)
    start[5] = float(C.JOINT_LIMITS_UPPER[5])
    key = jax.random.key(5)

    def violation(x):
        lo = np.asarray(C.JOINT_LIMITS_LOWER)[None, None]
        hi = np.asarray(C.JOINT_LIMITS_UPPER)[None, None]
        x = np.asarray(x, np.float64)
        return float(np.maximum(x - hi, 0).sum()
                     + np.maximum(lo - x, 0).sum())

    x_off = S.denoise_guided(_dummy_apply, None, sch, scene,
                             GuideParams(**base), start, goal, key,
                             batch_size=B, traj_len=N)
    x_on = S.denoise_guided(
        _dummy_apply, None, sch, scene,
        GuideParams(**base, joint_limit_weight=jnp.full(B, 5.0)),
        start, goal, key, batch_size=B, traj_len=N)
    v_off, v_on = violation(x_off[:, 1:-1]), violation(x_on[:, 1:-1])
    assert v_off > 0        # the failure mode exists
    assert v_on < 0.2 * v_off


def test_sampler_sc_assist_reduces_self_collision_cost():
    """With a self-colliding endpoint pair, assist-on trajectories must carry
    materially less capsule-penetration than assist-off (same RNG)."""
    T, B, N = 40, 4, 12
    sch = make_schedule(T)
    scene = pack_scene(np.array([[5.0, 5, 5, 0, 0, 0, 1, 0.1, 0.1, 0.1]]))
    base = dict(clearance=jnp.zeros((B, T)), expansion=jnp.zeros((B, T)),
                guidance_method=jnp.zeros(B), grad_norm=jnp.zeros(B),
                guidance_schedule=jnp.zeros((B, T)))
    # elbow-folded configuration: forearm near the base column
    start = np.asarray([0.0, -0.3, 0.0, -1.8, 0.0, 1.5, 0.0], np.float32)
    goal = np.asarray([2.4, 1.57, 2.4, -2.9, 2.4, 3.0, 2.4], np.float32)
    key = jax.random.key(9)

    def sc_cost(x):
        return float(A.self_collision_cost(jnp.asarray(x)[:, 1:-1, :],
                                           margin=0.0))

    x_off = S.denoise_guided(_dummy_apply, None, sch, scene,
                             GuideParams(**base), start, goal, key,
                             batch_size=B, traj_len=N)
    x_on = S.denoise_guided(
        _dummy_apply, None, sch, scene,
        GuideParams(**base, self_collision_weight=jnp.full(B, 20.0)),
        start, goal, key, batch_size=B, traj_len=N)
    assert sc_cost(x_off) > 0
    assert sc_cost(x_on) < 0.5 * sc_cost(x_off)


_SC_BAD = np.asarray([2.4, 1.57, 2.4, -2.9, 2.4, 3.0, 2.4], np.float32)
_SC_OK = np.asarray([0.0, -0.3, 0.0, -1.8, 0.0, 1.5, 0.0], np.float32)


def test_min_clearance_flags_known_configs():
    cl = np.asarray(A.min_clearance_per_config(
        jnp.asarray(np.stack([_SC_BAD, _SC_OK]))))
    assert cl[0] < 0 < cl[1]


def test_select_goal_sc_filter():
    """A self-colliding IK candidate closer to the start must lose to a
    clean one when sc_filter is on (and win when off — reference parity)."""
    from edmp_tpu.planner import select_goal

    scene = pack_scene(np.array([[9.0, 9, 9, 0, 0, 0, 1, 0.1, 0.1, 0.1]]))
    goals = jnp.asarray(np.stack([_SC_BAD, _SC_OK]))
    valid = jnp.asarray([True, True])
    start = jnp.asarray(_SC_BAD)  # distance 0 to the colliding candidate
    g_off = select_goal(goals, valid, start, scene, 8e-4, sc_filter=False)
    np.testing.assert_allclose(np.asarray(g_off), _SC_BAD)
    g_on = select_goal(goals, valid, start, scene, 8e-4, sc_filter=True)
    np.testing.assert_allclose(np.asarray(g_on), _SC_OK)
    # all-colliding candidate sets fall back to the unfiltered choice
    goals2 = jnp.asarray(np.stack([_SC_BAD, _SC_BAD]))
    g_fb = select_goal(goals2, valid, start, scene, 8e-4, sc_filter=True)
    np.testing.assert_allclose(np.asarray(g_fb), _SC_BAD)


def test_trajectory_safety_penalties():
    clean = jnp.asarray(np.tile(_SC_OK, (1, 5, 1)))
    dirty_sc = jnp.asarray(np.tile(_SC_BAD, (1, 5, 1)))
    jl_bad = np.tile(_SC_OK, (1, 5, 1)).copy()
    jl_bad[0, 2, 0] = float(C.JOINT_LIMITS_UPPER[0]) + 0.3
    p = np.asarray(A.trajectory_safety_penalties(
        jnp.concatenate([clean, dirty_sc, jnp.asarray(jl_bad)])))
    assert p[0] == 0.0
    assert p[1] >= 1e3 and p[2] >= 1e3
    # any clean sample must beat every dirty one even with a worse swept
    # cost (swept costs are O(1e-2))
    assert p[1] > 1.0 and p[2] > 1.0


def test_plan_scenes_with_assist_weights(toy_model_fixture=None):
    """plan_scenes tiles assist weights across the scene fold."""
    from edmp_tpu import planner as P
    from edmp_tpu.costs.obstacles import stack_scenes

    T, B, N, Ssc = 8, 4, 10, 2
    sch = make_schedule(T)
    scenes = stack_scenes([
        pack_scene(np.array([[0.5, 0, 0.5, 0, 0, 0, 1, 0.3, 0.3, 0.3]]),
                   max_obstacles=4) for _ in range(Ssc)])
    gp = GuideParams(
        clearance=jnp.zeros((B, T)), expansion=jnp.zeros((B, T)),
        guidance_method=jnp.zeros(B), grad_norm=jnp.zeros(B),
        guidance_schedule=jnp.full((B, T), 0.1),
        self_collision_weight=jnp.full(B, 1.0),
        joint_limit_weight=jnp.full(B, 1.0))
    cfg = P.PlannerConfig(batch_size=B, traj_len=N)
    starts = jnp.zeros((Ssc, 7))
    goals = jnp.tile(jnp.asarray([0.5, 0.3, 0, -1.5, 0, 1.8, 0]), (Ssc, 8, 1))
    valid = jnp.ones((Ssc, 8), bool)
    res = P.plan_scenes(_dummy_apply, None, sch, scenes, gp, starts,
                        goals, valid, jax.random.key(0), cfg)
    assert res.best.shape == (Ssc, N, 7)
    assert bool(jnp.all(jnp.isfinite(res.best)))


def test_lane_major_capsule_depths_match_naive(rng):
    """The lane-major safety-penalty depth == sum of naive capsule
    penetrations (selection-path speedup, docs/ddim_mfu.md lesson)."""
    from edmp_tpu.costs.assist import (_lane_major_capsule_depths,
                                       capsule_clearances)

    trajs = jnp.asarray(np.concatenate([
        rng.uniform(-2.0, 2.0, (5, 6, 7)),
        np.tile(_SC_BAD, (2, 6, 1)),
    ]), jnp.float32)
    naive = np.asarray(jnp.sum(jnp.maximum(-capsule_clearances(trajs), 0.0),
                               axis=(1, 2)))
    lane = np.asarray(_lane_major_capsule_depths(trajs))
    assert naive.max() > 0  # penetrating rows exist
    np.testing.assert_allclose(lane, naive, rtol=1e-4, atol=1e-6)
