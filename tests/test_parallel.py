"""Multi-device tests on the virtual 8-device CPU mesh: shardings,
collectives, sharded training step, and the resumable sweep driver."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edmp_tpu.parallel import collectives as coll
from edmp_tpu.parallel import mesh as M


def test_mesh_has_8_devices():
    mesh = M.make_mesh()
    assert mesh.devices.size == 8


def test_success_reducer_psum():
    mesh = M.make_mesh()
    reduce = coll.make_success_reducer(mesh)
    flags = jnp.asarray([1, 0, 1, 1, 0, 0, 1, 1], jnp.int32)
    assert int(reduce(flags)) == 5


def test_global_best_argmin_reduce(rng):
    mesh = M.make_mesh()
    best_fn = coll.make_global_best(mesh)
    B, N = 16, 10
    costs = jnp.asarray(rng.uniform(1, 5, B), jnp.float32)
    trajs = jnp.asarray(rng.normal(0, 1, (B, N, 7)), jnp.float32)
    c, t = best_fn(costs, trajs)
    i = int(np.argmin(np.asarray(costs)))
    assert float(c) == pytest.approx(float(costs[i]))
    np.testing.assert_allclose(np.asarray(t), np.asarray(trajs[i]), atol=1e-6)


def test_sharded_train_step_runs():
    from edmp_tpu.data.synthetic import smooth_trajectories
    from edmp_tpu.diffusion.schedule import make_schedule
    from edmp_tpu.diffusion.training import (TrainConfig, init_state,
                                             make_sharded_train_step)
    from edmp_tpu.models import temporal_unet as tu

    mesh = M.make_mesh(axis=M.DATA_AXIS)
    model = tu.TemporalUNet(input_dim=7, time_dim=8, dims=(8, 16))
    cfg = TrainConfig(batch_size=16)
    sch = make_schedule(16)
    state = init_state(model, jax.random.key(0), cfg, traj_len=12)
    step = make_sharded_train_step(model, sch, cfg, mesh)
    x0 = jnp.asarray(smooth_trajectories(np.random.default_rng(0), 16, 12))
    with mesh:
        state2, loss1 = step(state, x0, jax.random.key(1))
        state3, loss2 = step(state2, x0, jax.random.key(1))
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) <= float(loss1) * 1.5  # sanity: no blowup
    assert int(state3.step) == 2


def test_sharded_plan_scenes_on_mesh(rng):
    """The folded planner shards over the scene axis with replicated params
    and produces the same result as the unsharded run."""
    from edmp_tpu import planner as P
    from edmp_tpu.config import GuideConfig, pack_ensemble
    from edmp_tpu.costs.obstacles import pack_scene, stack_scenes
    from edmp_tpu.data import synthetic
    from edmp_tpu.diffusion.schedule import make_schedule
    from edmp_tpu.models import temporal_unet as tu

    T, N = 6, 12
    model = tu.TemporalUNet(input_dim=7, time_dim=8, dims=(8, 16))
    params = tu.init_params(jax.random.key(0), model, traj_len=N)
    sch = make_schedule(T)
    seg = (((0, 3), (0.0, 0.0)), ((3, 5), (0.0, 0.0)), ((5, 6), (0.0, 0.0)))
    gcfg = GuideConfig((0.05, 0.05), seg, "iv", False, "constant", 0.2, 8e-4)
    gp, _ = pack_ensemble([gcfg], batch_per_guide=2, T=T)
    cfg = P.PlannerConfig(batch_size=2, traj_len=N)

    S = 8
    scenes, starts, goals, valids = [], [], [], []
    for _ in range(S):
        oc, st, gl, va = synthetic.random_problem(rng, 4, 8)
        scenes.append(pack_scene(oc))
        starts.append(st)
        goals.append(gl)
        valids.append(va)
    scene_b = stack_scenes(scenes)
    starts = jnp.asarray(np.stack(starts), jnp.float32)
    goals = jnp.asarray(np.stack(goals), jnp.float32)
    valids = jnp.asarray(np.stack(valids))
    key = jax.random.key(3)

    plain = P.make_batched_plan_fn(model, sch, cfg)
    res_plain = plain(params, scene_b, gp, starts, goals, valids, key)

    mesh = M.make_mesh()
    shard = M.scene_sharding(mesh)
    repl = M.replicated(mesh)

    def apply_fn(p, x, t):
        return model.apply({"params": p}, x, t)

    sharded = jax.jit(
        lambda p, sc, g, st, gl, va, k: P.plan_scenes(
            apply_fn, p, sch, sc, g, st, gl, va, k, cfg),
        in_shardings=(repl, shard, repl, shard, shard, shard, repl),
    )
    with mesh:
        res_sh = sharded(params, jax.device_put(scene_b, shard), gp,
                         jax.device_put(starts, shard),
                         jax.device_put(goals, shard),
                         jax.device_put(valids, shard), key)
    np.testing.assert_allclose(np.asarray(res_sh.best),
                               np.asarray(res_plain.best), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(res_sh.best_index),
                                  np.asarray(res_plain.best_index))


def test_sweep_driver_resume(tmp_path, rng):
    from edmp_tpu import planner as P
    from edmp_tpu.config import GuideConfig, pack_ensemble
    from edmp_tpu.data.synthetic import synthetic_packed_dataset
    from edmp_tpu.diffusion.schedule import make_schedule
    from edmp_tpu.models import temporal_unet as tu
    from edmp_tpu.parallel.sweep import SweepConfig, run_sweep

    T, N = 6, 12
    model = tu.TemporalUNet(input_dim=7, time_dim=8, dims=(8, 16))
    params = tu.init_params(jax.random.key(0), model, traj_len=N)
    sch = make_schedule(T)
    seg = (((0, 3), (0.0, 0.0)), ((3, 5), (0.0, 0.0)), ((5, 6), (0.0, 0.0)))
    gcfg = GuideConfig((0.05, 0.05), seg, "sv", False, "constant", 0.2, 8e-4)
    gp, _ = pack_ensemble([gcfg], batch_per_guide=2, T=T)
    cfg = P.PlannerConfig(batch_size=2, traj_len=N)

    ds = synthetic_packed_dataset(np.random.default_rng(1), 5)
    scfg = SweepConfig(scenes_per_batch=2, substeps=2, n_q7_seeds=8,
                       results_dir=str(tmp_path), oracle_threads=False)

    st = run_sweep(model, params, sch, gp, ds, cfg, scfg, tag="t",
                   max_scenes=3)
    assert len(st.completed) == 3
    summary = st.summary()
    assert summary["overall"]["n"] == 3

    # resume: completes the remaining 2 without redoing the first 3
    st2 = run_sweep(model, params, sch, gp, ds, cfg, scfg, tag="t")
    assert len(st2.completed) == 5
    assert summary["overall"]["n"] == 3  # old snapshot untouched


def _tiny_setup(rng, n_guides=2, bpg=2):
    """Shared tiny model/guide/dataset setup for the driver-level tests."""
    from edmp_tpu import planner as P
    from edmp_tpu.config import GuideConfig, pack_ensemble
    from edmp_tpu.diffusion.schedule import make_schedule
    from edmp_tpu.models import temporal_unet as tu

    T, N = 6, 12
    model = tu.TemporalUNet(input_dim=7, time_dim=8, dims=(8, 16))
    params = tu.init_params(jax.random.key(0), model, traj_len=N)
    sch = make_schedule(T)
    seg = (((0, 3), (0.0, 0.0)), ((3, 5), (0.0, 0.0)), ((5, 6), (0.0, 0.0)))
    gcfgs = [
        GuideConfig((0.05, 0.05), seg, "iv", False, "constant", 0.2, 8e-4),
        GuideConfig((0.02, 0.02), seg, "sv", True, "constant", 0.1, 8e-4),
    ][:n_guides]
    gp, _ = pack_ensemble(gcfgs, batch_per_guide=bpg, T=T)
    cfg = P.PlannerConfig(batch_size=n_guides * bpg, traj_len=N)
    return model, params, sch, gp, cfg


def test_sweep_driver_meshed_matches_unsharded(tmp_path, rng):
    """run_sweep(mesh=...) — the production multi-chip path — must reproduce
    the single-device sweep verdicts, and per-guide attribution must land in
    the spool and summary."""
    from edmp_tpu.data.synthetic import synthetic_packed_dataset
    from edmp_tpu.parallel.sweep import SweepConfig, run_sweep

    model, params, sch, gp, cfg = _tiny_setup(rng)
    ds = synthetic_packed_dataset(np.random.default_rng(1), 6)
    guide_ids = [3, 13]

    def sweep(tag, mesh):
        # scenes_per_batch = mesh size so both runs chunk (and therefore
        # draw per-chunk q7 seeds / fold RNG) identically
        scfg = SweepConfig(scenes_per_batch=8, substeps=2, n_q7_seeds=8,
                           results_dir=str(tmp_path), oracle_threads=False)
        return run_sweep(model, params, sch, gp, ds, cfg, scfg, tag=tag,
                         mesh=mesh, guide_ids=guide_ids)

    st_plain = sweep("plain", None)
    st_mesh = sweep("mesh", M.make_mesh())

    assert len(st_mesh.completed) == 6
    for i in st_plain.completed:
        a, b = st_plain.completed[i], st_mesh.completed[i]
        assert a["success"] == b["success"]
        assert a["swept_cost"] == pytest.approx(b["swept_cost"], rel=1e-4,
                                                abs=1e-6)
        assert a["winning_guide"] == b["winning_guide"]
        assert b["winning_guide"] in guide_ids
        assert set(b["per_guide_min_cost"]) == {"3", "13"}
        # the winner's own min cost IS the selected cost
        assert min(b["per_guide_min_cost"].values()) == pytest.approx(
            b["swept_cost"], rel=1e-4, abs=1e-6)
    summary = st_mesh.summary()
    assert "per_guide" in summary
    assert sum(v["wins"] for v in summary["per_guide"].values()) == 6
    # meshed runs source per-guide stats from the device psum tally, and the
    # reduction must agree with the single-device host derivation
    assert summary["per_guide_source"] == "device_psum"
    plain_summary = st_plain.summary()
    assert "per_guide_source" not in plain_summary
    for g in plain_summary["per_guide"]:
        assert summary["per_guide"][g]["wins"] == \
            plain_summary["per_guide"][g]["wins"]
        assert summary["per_guide"][g]["successes_when_winning"] == \
            plain_summary["per_guide"][g]["successes_when_winning"]
    assert st_mesh.device_success_total == \
        plain_summary["overall"]["successes"]


def test_per_guide_tally_device_reduction():
    """make_per_guide_tally: psum-reduced wins / successes-when-winning /
    total successes over a sharded scene axis, with -1 = unattributed."""
    mesh = M.make_mesh()
    H = 3
    win = jnp.asarray([0, 1, 1, 2, -1, 0, 1, 2], jnp.int32)
    suc = jnp.asarray([1, 0, 1, 1, 1, 0, 1, 0], jnp.int32)
    wins, succ_win, total = coll.make_per_guide_tally(mesh, H)(win, suc)
    np.testing.assert_array_equal(np.asarray(wins), [2, 3, 2])
    np.testing.assert_array_equal(np.asarray(succ_win), [1, 2, 1])
    assert int(total) == 5


def test_sweep_retry_failed_monotone(tmp_path, rng):
    """Reseed-retry: success is monotone in retry rounds, replacements are
    strictly better, and the spool's last-line-wins resume reflects them."""
    import json

    from edmp_tpu.data.synthetic import synthetic_packed_dataset
    from edmp_tpu.parallel.sweep import SweepConfig, run_sweep

    model, params, sch, gp, cfg = _tiny_setup(rng)
    ds = synthetic_packed_dataset(np.random.default_rng(3), 6)

    base = SweepConfig(scenes_per_batch=2, substeps=2, n_q7_seeds=8,
                       results_dir=str(tmp_path), oracle_threads=False)
    st0 = run_sweep(model, params, sch, gp, ds, cfg, base, tag="noretry")
    retried = SweepConfig(scenes_per_batch=2, substeps=2, n_q7_seeds=8,
                          results_dir=str(tmp_path), oracle_threads=True,
                          retry_failed=2)
    st1 = run_sweep(model, params, sch, gp, ds, cfg, retried, tag="retry")

    s0 = st0.summary()["overall"]
    s1 = st1.summary()["overall"]
    assert s1["n"] == s0["n"] == 6
    # a retry replaces a record only when strictly better -> monotone, and
    # any main-pass success must survive untouched
    assert s1["successes"] >= s0["successes"]
    for i, rec in st1.completed.items():
        if st0.completed[i]["success"]:
            assert rec["success"] and rec["attempt"] == 0

    # spool: per scene, records appear in attempt order and each later one
    # is strictly better (success over failure, then lower cost)
    per_scene = {}
    with open(st1.path) as f:
        for line in f:
            rec = json.loads(line)
            per_scene.setdefault(rec["scene_index"], []).append(rec)
    for recs in per_scene.values():
        for a, b in zip(recs, recs[1:]):
            assert b["attempt"] > a["attempt"]
            assert (b["success"], -b["swept_cost"]) > (
                a["success"], -a["swept_cost"])

    # resume on the retried spool: nothing pending, last-line-wins
    st2 = run_sweep(model, params, sch, gp, ds, cfg, base, tag="retry")
    assert {i: r["success"] for i, r in st2.completed.items()} == {
        i: r["success"] for i, r in st1.completed.items()}


def test_sweep_retry_evaluator_no_double_count(tmp_path, rng):
    """With full_evaluation, a retried scene must appear exactly once in the
    evaluator-backed protocol aggregate (no double-counting)."""
    from edmp_tpu.data.synthetic import synthetic_packed_dataset
    from edmp_tpu.parallel.sweep import SweepConfig, run_sweep

    model, params, sch, gp, cfg = _tiny_setup(rng)
    ds = synthetic_packed_dataset(np.random.default_rng(3), 4)
    scfg = SweepConfig(scenes_per_batch=2, substeps=2, n_q7_seeds=8,
                       results_dir=str(tmp_path), oracle_threads=False,
                       full_evaluation=True, retry_failed=1)
    st = run_sweep(model, params, sch, gp, ds, cfg, scfg, tag="ev")
    prot = st.summary()["protocol"]
    assert prot["n"] == 4  # one protocol row per scene despite retries
    # the evaluator aggregate must hold exactly one evaluation per scene
    # (retries replace in place, never append); IK-skip scenes additionally
    # carry a skip entry (pre-existing bookkeeping, not retry-related)
    assert len(st.evaluator.results) == 4


def test_validator_error_propagates(tmp_path, rng):
    """An exception inside the oracle/evaluation thread must fail the sweep
    loudly, not die silently in a daemon thread."""
    from unittest import mock

    from edmp_tpu.data.synthetic import synthetic_packed_dataset
    from edmp_tpu.parallel.sweep import SweepConfig, run_sweep
    from edmp_tpu.validation.oracle import TrajectoryOracle

    model, params, sch, gp, cfg = _tiny_setup(rng)
    ds = synthetic_packed_dataset(np.random.default_rng(1), 2)
    scfg = SweepConfig(scenes_per_batch=2, substeps=2, n_q7_seeds=8,
                      results_dir=str(tmp_path), oracle_threads=True)
    with mock.patch.object(TrajectoryOracle, "validate",
                           side_effect=RuntimeError("oracle exploded")):
        with pytest.raises(RuntimeError, match="failed validation"):
            run_sweep(model, params, sch, gp, ds, cfg, scfg, tag="err")


def test_large_batch_plan_sharded(rng):
    """The BASELINE '1 scene x 1000+ trajectories' path: batch sharded over
    the mesh, selection via the explicit cross-shard argmin-reduce."""
    from edmp_tpu import planner as P
    from edmp_tpu.costs.obstacles import pack_scene
    from edmp_tpu.data import synthetic

    model, params, sch, gp, cfg = _tiny_setup(rng, n_guides=2, bpg=8)
    oc, start, goals, valid = synthetic.random_problem(rng, 4, 8)
    scene = pack_scene(oc)
    mesh = M.make_mesh()

    fn = P.make_large_batch_plan_fn(model, sch, cfg, mesh)
    best, best_cost, goal, costs = fn(
        params, scene, gp, jnp.asarray(start, jnp.float32),
        jnp.asarray(goals, jnp.float32), jnp.asarray(valid),
        jax.random.key(5))
    costs = np.asarray(costs)
    assert costs.shape == (16,)
    assert float(best_cost) == pytest.approx(float(costs.min()), rel=1e-5)
    # the returned trajectory is the argmin sample
    i = int(costs.argmin())
    plain = P.make_plan_fn(model, sch, cfg)(
        params, scene, gp, jnp.asarray(start, jnp.float32),
        jnp.asarray(goals, jnp.float32), jnp.asarray(valid),
        jax.random.key(5))
    assert int(plain.best_index) == i
    np.testing.assert_allclose(np.asarray(best), np.asarray(plain.best),
                               atol=1e-5)


def test_parse_retry_ladder():
    from edmp_tpu.parallel.sweep import RetryRound, parse_retry_ladder

    ladder = parse_retry_ladder(
        "mult=2;mult=4,clear=0.02,envw=0.3,sampler=ddpm,steps=16,spb=4")
    assert ladder == [
        RetryRound(batch_mult=2),
        RetryRound(batch_mult=4, clearance_bump=0.02,
                   env_clearance_weight=0.3, sampler="ddpm", ddim_steps=16,
                   scenes_per_batch=4),
    ]
    # empty entry = reseed-only round
    assert parse_retry_ladder(";mult=2")[0] == RetryRound()


def test_sweep_safe_mode_costs_comparable(tmp_path, rng):
    """Spool hygiene (r4 verdict weak #8): with --safe-selection the recorded
    swept_cost must be the RAW swept volume (comparable with unsafe runs);
    the 1e3-class penalty and its violated classes land in separate fields."""
    import dataclasses as dc

    from edmp_tpu.data.synthetic import synthetic_packed_dataset
    from edmp_tpu.parallel.sweep import SweepConfig, run_sweep

    model, params, sch, gp, cfg = _tiny_setup(rng)
    safe_cfg = dc.replace(cfg, safety_aware_selection=True)
    ds = synthetic_packed_dataset(np.random.default_rng(3), 4)
    scfg = SweepConfig(scenes_per_batch=2, substeps=2, n_q7_seeds=8,
                       results_dir=str(tmp_path), oracle_threads=False)
    st_unsafe = run_sweep(model, params, sch, gp, ds, cfg, scfg, tag="u",
                          guide_ids=[3, 13])
    st_safe = run_sweep(model, params, sch, gp, ds, safe_cfg, scfg, tag="s",
                        guide_ids=[3, 13])
    for i, rec in st_safe.completed.items():
        # raw swept volumes are O(1e-2); a penalty-polluted cost would be
        # >= 1e3.  Also: per-guide min costs are raw too.
        assert rec["swept_cost"] < 100.0
        assert all(c < 100.0 for c in rec["per_guide_min_cost"].values())
        if rec["violation_classes"]:
            assert rec["selection_penalty"] >= 1e3
            assert set(rec["violation_classes"]) <= {
                "self_collision", "joint_limit", "env_predicted"}
        else:
            assert rec["selection_penalty"] == 0.0
        # unsafe records on the same scenes stay penalty-free
        assert st_unsafe.completed[i]["selection_penalty"] == 0.0
        assert st_unsafe.completed[i]["violation_classes"] is None


def test_sweep_retry_ladder_escalates(tmp_path, rng):
    """The escalating retry ladder: rounds run with multiplied sample
    budgets / extra guidance terms, success stays monotone vs no-retry, and
    per-guide attribution remains consistent under the block tiling."""
    from edmp_tpu.data.synthetic import synthetic_packed_dataset
    from edmp_tpu.parallel.sweep import (RetryRound, SweepConfig, run_sweep)

    model, params, sch, gp, cfg = _tiny_setup(rng)
    ds = synthetic_packed_dataset(np.random.default_rng(3), 6)
    base = SweepConfig(scenes_per_batch=2, substeps=2, n_q7_seeds=8,
                       results_dir=str(tmp_path), oracle_threads=False)
    st0 = run_sweep(model, params, sch, gp, ds, cfg, base, tag="base",
                    guide_ids=[3, 13])
    ladder = SweepConfig(
        scenes_per_batch=2, substeps=2, n_q7_seeds=8,
        results_dir=str(tmp_path), oracle_threads=False,
        retry_ladder=[
            RetryRound(batch_mult=2, clearance_bump=0.01),
            RetryRound(batch_mult=2, env_clearance_weight=0.3,
                       scenes_per_batch=4),
        ])
    st1 = run_sweep(model, params, sch, gp, ds, cfg, ladder, tag="ladder",
                    guide_ids=[3, 13])
    s0, s1 = st0.summary()["overall"], st1.summary()["overall"]
    assert s1["n"] == s0["n"] == 6
    assert s1["successes"] >= s0["successes"]
    for i, rec in st1.completed.items():
        assert rec["winning_guide"] in (3, 13)
        if st0.completed[i]["success"]:  # main-pass successes untouched
            assert rec["success"] and rec["attempt"] == 0
        assert rec["attempt"] in (0, 1, 2)
