"""End-to-end planner tests with a tiny denoiser (fast on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edmp_tpu import planner as P
from edmp_tpu.config import GuideConfig, pack_ensemble
from edmp_tpu.costs.obstacles import pack_scene
from edmp_tpu.data import synthetic
from edmp_tpu.diffusion.schedule import make_schedule
from edmp_tpu.models import temporal_unet as tu

TINY_T = 10
TINY_N = 12


def tiny_guides():
    seg = (((0, 5), (0.0, 0.0)), ((5, 8), (0.0, 0.0)), ((8, 10), (0.0, 0.0)))
    return [
        GuideConfig(clearance_range=(0.05, 0.05), expansion_segments=seg,
                    guidance_method="iv", grad_norm=False,
                    schedule_type="constant", scale_val=0.3,
                    volume_trust_region=8e-4),
        GuideConfig(clearance_range=(0.1, 0.1), expansion_segments=seg,
                    guidance_method="sv", grad_norm=True,
                    schedule_type="varying", scale_val=0.05,
                    volume_trust_region=8e-4),
    ]


@pytest.fixture(scope="module")
def tiny_setup():
    model = tu.TemporalUNet(input_dim=7, time_dim=8, dims=(8, 16))
    params = tu.init_params(jax.random.key(0), model, traj_len=TINY_N)
    sch = make_schedule(TINY_T)
    gp, _ = pack_ensemble(tiny_guides(), batch_per_guide=2, T=TINY_T)
    cfg = P.PlannerConfig(batch_size=4, traj_len=TINY_N)
    return model, params, sch, gp, cfg


def test_select_goal_trust_region_and_distance(rng):
    """select_goal must agree with a direct numpy transcription of the filter
    (infer_serial.py:119-129): among candidates whose t=0 volume is within
    the trust region of the minimum, pick the closest to start."""
    from edmp_tpu.costs.guide import ik_goal_volumes

    scene = pack_scene(np.array([[0.45, 0.0, 0.55, 0, 0, 0, 1, 0.6, 0.9, 0.8]]))
    goals = jnp.asarray(rng.uniform(-1.5, 1.5, (24, 7)), jnp.float32)
    start = jnp.asarray(rng.uniform(-0.5, 0.5, 7), jnp.float32)
    valid = np.ones(24, bool)
    valid[rng.integers(0, 24, 6)] = False

    vols = np.asarray(ik_goal_volumes(goals, scene), np.float64)
    vols[~valid] = np.inf
    eligible = vols < vols.min() + 8e-4
    dist = np.linalg.norm(np.asarray(start) - np.asarray(goals), axis=1)
    dist[~eligible] = np.inf
    want = np.asarray(goals)[np.argmin(dist)]
    # sanity: the scene actually discriminates (some goals collide)
    assert np.isfinite(vols[valid]).all() and (vols[valid] > 0).any()

    picked = P.select_goal(goals, jnp.asarray(valid), start, scene,
                           trust_region=8e-4)
    np.testing.assert_allclose(np.asarray(picked), want, atol=1e-6)


def test_plan_end_to_end(tiny_setup, rng):
    model, params, sch, gp, cfg = tiny_setup
    obstacle_config, start, ik_goals, ik_valid = synthetic.random_problem(rng)
    scene = pack_scene(obstacle_config)
    fn = P.make_plan_fn(model, sch, cfg)
    res = fn(params, scene, gp, jnp.asarray(start, jnp.float32),
             jnp.asarray(ik_goals, jnp.float32), jnp.asarray(ik_valid),
             jax.random.key(0))
    assert res.trajectories.shape == (4, TINY_N, 7)
    assert res.best.shape == (TINY_N, 7)
    assert int(res.best_index) == int(jnp.argmin(res.swept_costs))
    np.testing.assert_allclose(np.asarray(res.best[0]), start, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.best[-1]), np.asarray(res.goal),
                               atol=1e-5)
    # the chosen goal is one of the valid candidates
    d = np.linalg.norm(ik_goals[ik_valid] - np.asarray(res.goal), axis=1)
    assert d.min() < 1e-5


def test_batched_plan_over_scenes(tiny_setup, rng):
    model, params, sch, gp, cfg = tiny_setup
    S = 2
    scenes, starts, goals, valids = [], [], [], []
    for _ in range(S):
        oc, st, gl, va = synthetic.random_problem(rng)
        scenes.append(pack_scene(oc))
        starts.append(st)
        goals.append(gl)
        valids.append(va)
    scene_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    fn = P.make_batched_plan_fn(model, sch, cfg)
    res = fn(params, scene_batch, gp,
             jnp.asarray(np.stack(starts), jnp.float32),
             jnp.asarray(np.stack(goals), jnp.float32),
             jnp.asarray(np.stack(valids)),
             jax.random.key(1))
    assert res.trajectories.shape == (S, 4, TINY_N, 7)
    assert res.best.shape == (S, TINY_N, 7)
    for s in range(S):
        assert int(res.best_index[s]) == int(np.argmin(
            np.asarray(res.swept_costs[s])))
        np.testing.assert_allclose(np.asarray(res.best[s, 0]), starts[s],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(res.best[s, -1]),
                                   np.asarray(res.goal[s]), atol=1e-5)


def test_folded_matches_single_scene(tiny_setup, rng):
    """Scene-folding must reproduce the single-scene pipeline bit-for-bit
    modulo RNG layout: run S=1 folded vs plan() with the same key and check
    goals, costs ordering and endpoint pinning agree."""
    model, params, sch, gp, cfg = tiny_setup
    oc, st, gl, va = synthetic.random_problem(rng)
    scene = pack_scene(oc)
    scene_batch = jax.tree.map(lambda x: x[None], scene)
    fn_b = P.make_batched_plan_fn(model, sch, cfg)
    fn_s = P.make_plan_fn(model, sch, cfg)
    key = jax.random.key(5)
    rb = fn_b(params, scene_batch, gp, jnp.asarray(st, jnp.float32)[None],
              jnp.asarray(gl, jnp.float32)[None], jnp.asarray(va)[None], key)
    rs = fn_s(params, scene, gp, jnp.asarray(st, jnp.float32),
              jnp.asarray(gl, jnp.float32), jnp.asarray(va), key)
    np.testing.assert_allclose(np.asarray(rb.goal[0]), np.asarray(rs.goal),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(rb.trajectories[0]),
                               np.asarray(rs.trajectories), atol=1e-5)
    assert int(rb.best_index[0]) == int(rs.best_index)


def test_reference_guide_registry(tmp_path):
    """The built-in guide registry emits reference-format YAMLs that round
    trip through the YAML loader into identical packed ensembles."""
    from edmp_tpu.config import (CFG1_GUIDE_IDS, load_guide_set,
                                 pack_ensemble, reference_guide_configs,
                                 write_guide_yamls)

    write_guide_yamls(str(tmp_path), CFG1_GUIDE_IDS)
    from_files = load_guide_set(str(tmp_path), CFG1_GUIDE_IDS)
    from_table = reference_guide_configs(CFG1_GUIDE_IDS)
    assert from_files == from_table

    gp, vtr = pack_ensemble(from_table, batch_per_guide=10, T=255)
    assert gp.clearance.shape == (120, 255)
    # guide 5 rows: clearance ramps 0.01 -> 0.15 over T
    import numpy as np

    row = np.asarray(gp.clearance)[45]  # guide 5 occupies rows 40..49
    assert row[0] == np.float32(0.01) and abs(row[-1] - 0.15) < 1e-6
    # guide 18 (rows 100..109): isr3 [0,20) overwrites isr2's [10,20) with 0
    # (segments apply in isr1, isr2, isr3 order, infer_serial.py:78-80)
    row18 = np.asarray(gp.expansion)[100]
    assert np.all(row18[:20] == 0.0)
    assert abs(row18[39] - 0.4) < 0.02 and row18[200] == np.float32(0.4)
