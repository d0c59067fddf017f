"""Resumable benchmark sweep over a packed problem dataset.

The TPU replacement for the reference's per-scene Python loop
(infer_serial.py:95-170).  Scenes are processed in device-batches of
``scenes_per_batch`` (folded into the sample axis, planner.plan_scenes),
sharded over the mesh's 'scenes' axis when more than one device is present.
Per-scene results append to a JSONL spool with a completed-set state file, so
a killed multi-host run resumes where it stopped (SURVEY.md §5: the reference
has no such recovery — a crash kills the sweep).

Pipeline per batch:
  1. device: IK goal sweep per scene (vmapped analytic IK)
  2. device: folded guided planning + best-of-ensemble selection
  3. host:   native-oracle validation of the selected trajectories (overlapped
             with the next batch's device work via a worker thread)
"""

from __future__ import annotations

import dataclasses
import json
import os
import queue
import threading
import time
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from edmp_tpu import constants as C
from edmp_tpu import planner as P
from edmp_tpu.costs.guide import GuideParams
from edmp_tpu.costs.obstacles import pack_scene, stack_scenes
from edmp_tpu.data.problems import SCENE_TYPES, PackedDataset
from edmp_tpu.diffusion.schedule import DiffusionSchedule
from edmp_tpu.robot import ik as IK
from edmp_tpu.validation.oracle import TrajectoryOracle


@dataclasses.dataclass
class RetryRound:
    """One escalation step of the retry ladder (``SweepConfig.retry_ladder``).

    Reseed-only retries (all defaults) redraw sampling noise + IK q7 seeds
    with an otherwise identical configuration; the escalation knobs attack
    the structurally-hard scenes the round-4 study showed survive pure
    reseeding (docs/retry_study.md: 12/128 env-collision failures persist
    through 3 reseeds):

      * ``batch_mult``: multiply the sample budget (each guide's block of
        the ensemble repeats, so per-guide attribution is preserved).
      * ``clearance_bump``: additive bump (meters) on every guide's
        obstacle-clearance schedule — earlier/stronger repulsion, the
        per-sample knob the reference exposes via its guide YAMLs
        (lib/guide.py:118-158).
      * ``env_clearance_weight``: enable the exact-SDF clearance hinge
        (costs/clearance.py) at this step weight for ALL samples.
      * ``sampler`` / ``ddim_steps``: escalate the sampler (e.g. DDPM-255
        when the main pass ran fast DDIM-16).
      * ``scenes_per_batch``: smaller fold for the (few) retry scenes.

    Each DISTINCT escalation configuration compiles its own device program
    (one extra compile per distinct round on a cold process).
    """

    batch_mult: int = 1
    clearance_bump: float = 0.0
    env_clearance_weight: float = 0.0
    sampler: Optional[str] = None
    ddim_steps: Optional[int] = None
    scenes_per_batch: Optional[int] = None


def parse_retry_ladder(spec: str) -> List[RetryRound]:
    """Parse a CLI ladder spec: rounds split by ';', knobs by ','.

    Example: ``"mult=2;mult=4,clear=0.02;mult=4,envw=0.3,sampler=ddpm"``.
    Knob keys: mult, clear, envw, sampler, steps, spb.
    """
    keymap = {"mult": ("batch_mult", int),
              "clear": ("clearance_bump", float),
              "envw": ("env_clearance_weight", float),
              "sampler": ("sampler", str),
              "steps": ("ddim_steps", int),
              "spb": ("scenes_per_batch", int)}
    rounds = []
    for part in spec.split(";"):
        part = part.strip()
        kwargs = {}
        if part:
            for kv in part.split(","):
                k, v = kv.split("=")
                field, conv = keymap[k.strip()]
                kwargs[field] = conv(v.strip())
        rounds.append(RetryRound(**kwargs))
    return rounds


@dataclasses.dataclass
class SweepConfig:
    # measured S-scaling optimum on v5e (docs/roofline.md): throughput rises
    # 21.4 (S=6) -> 23.7 (S=17) to a flat top at S=21-25 (24.4 scenes/s),
    # then declines (23.2 at S=29).  16 sits just under the top while
    # keeping partial-batch padding waste moderate for small sweeps; pass
    # 21 for long production sweeps.
    scenes_per_batch: int = 16
    # 8 is the convergence point of the substeps sweep in
    # docs/oracle_calibration.md (sparse-corpus flips reach 0 there);
    # TrajectoryOracle and the CLI share this default.
    substeps: int = 8
    seed: int = 0
    n_q7_seeds: int = 100
    results_dir: str = "./results"
    oracle_threads: bool = True
    # run the full MPiNets metric protocol (position/orientation buckets,
    # SPARC, path lengths) per scene in addition to the success oracle
    full_evaluation: bool = False
    # adaptive reseed-retry: after the main pass, re-plan scenes that FAILED
    # (strict protocol when full_evaluation, else the collision oracle) up to
    # this many extra rounds, each with fresh sampling/IK-seed randomness.
    # A retry's result replaces the spooled record only when strictly better
    # (success over failure, then lower swept cost), so success is monotone
    # in retry rounds.  Beyond the reference (infer_serial.py plans each
    # scene exactly once); this is the production failure-recovery loop.
    retry_failed: int = 0
    # escalating retry ladder: round k (1-based) uses retry_ladder[k-1]
    # (the last entry repeats beyond the list).  None = reseed-only retries.
    # When set, at least len(retry_ladder) rounds run even if retry_failed
    # is smaller.
    retry_ladder: Optional[List[RetryRound]] = None


@dataclasses.dataclass
class SceneResult:
    scene_index: int
    scene_type: str
    success: bool
    swept_cost: float
    plan_time: float
    goal: List[float]
    metrics: Optional[dict] = None  # full_evaluation fields when enabled
    # ensemble attribution: which guide produced the selected trajectory and
    # each guide's own best (min) swept cost keyed by guide id — EDMP's core
    # ensemble claim made inspectable per scene
    winning_guide: Optional[int] = None
    per_guide_min_cost: Optional[Dict[str, float]] = None
    # IK provenance: None = analytic sweep, 'dls' = damped-least-squares
    # fallback, 'failed' = no valid goal found (scene counted as a skip in
    # the evaluator, mpinets/metrics.py:487-491 semantics)
    ik_fallback: Optional[str] = None
    # which reseed-retry round produced this record (0 = the main pass);
    # spool resume is last-line-wins, so a later attempt supersedes
    attempt: int = 0
    # safety-aware selection bookkeeping: ``swept_cost`` above is always the
    # RAW swept volume of the selected sample (comparable across safe and
    # unsafe runs); the 1e3-class selection penalty and its violated classes
    # are recorded separately (costs/assist.VIOLATION_* semantics)
    selection_penalty: float = 0.0
    violation_classes: Optional[List[str]] = None

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


class SweepState:
    """JSONL spool + resume bookkeeping."""

    def __init__(self, results_dir: str, tag: str):
        os.makedirs(results_dir, exist_ok=True)
        self.path = os.path.join(results_dir, f"sweep_{tag}.jsonl")
        self.completed: Dict[int, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                        self.completed[rec["scene_index"]] = rec
                    except json.JSONDecodeError:
                        continue  # torn tail write from a crash
        self._f = open(self.path, "a")
        self._lock = threading.Lock()
        # per-scene phase timings of THIS run (not spooled; resumed scenes
        # have no fresh timing) — surfaced via summary()["timing"]
        self.timings: List[dict] = []
        # device-reduced per-guide statistics (collectives.make_per_guide_tally)
        # set by run_sweep on meshed runs; summary() sources its per-guide
        # wins/successes from this when present instead of re-deriving host-side
        self.device_per_guide: Optional[Dict[int, dict]] = None
        self.device_success_total: Optional[int] = None
        # the protocol Evaluator of the most recent run_sweep on this state
        # (None unless full_evaluation); retries replace entries in place
        self.evaluator = None

    def record(self, result: SceneResult) -> None:
        with self._lock:
            self.completed[result.scene_index] = dataclasses.asdict(result)
            self._f.write(result.to_json() + "\n")
            self._f.flush()

    def pending(self, indices) -> np.ndarray:
        return np.asarray([i for i in indices if i not in self.completed],
                          np.int64)

    def summary(self) -> Dict[str, dict]:
        by_type: Dict[str, List[dict]] = {}
        for rec in self.completed.values():
            by_type.setdefault(rec["scene_type"], []).append(rec)
        out = {}
        total_n, total_s = 0, 0
        for st, recs in sorted(by_type.items()):
            n = len(recs)
            s = sum(r["success"] for r in recs)
            out[st] = {"n": n, "successes": s,
                       "success_rate": 100.0 * s / n if n else 0.0}
            total_n += n
            total_s += s
        out["overall"] = {"n": total_n, "successes": total_s,
                          "success_rate":
                          100.0 * total_s / total_n if total_n else 0.0}
        # per-guide ensemble attribution (win = produced the selected
        # trajectory; min-cost stats over each guide's own best sample).
        # On meshed runs the wins/successes come from the device psum tally
        # (collectives.make_per_guide_tally); the host derivation covers
        # single-device runs and resumed spools.
        costs_by_guide: Dict[int, List[float]] = {}
        for rec in self.completed.values():
            for gi, c in (rec.get("per_guide_min_cost") or {}).items():
                costs_by_guide.setdefault(int(gi), []).append(c)
        if self.device_per_guide is not None:
            n_attr = sum(d["wins"] for d in self.device_per_guide.values())
            out["per_guide"] = {
                str(g): {
                    "wins": d["wins"],
                    "win_rate": 100.0 * d["wins"] / n_attr if n_attr else 0.0,
                    "successes_when_winning": d["successes_when_winning"],
                } for g, d in sorted(self.device_per_guide.items())
                if d["wins"]
            }
            out["per_guide_source"] = "device_psum"
        else:
            wins: Dict[int, int] = {}
            win_success: Dict[int, int] = {}
            for rec in self.completed.values():
                g = rec.get("winning_guide")
                if g is None:
                    continue
                wins[g] = wins.get(g, 0) + 1
                win_success[g] = win_success.get(g, 0) + int(rec["success"])
            if wins:
                n_attr = sum(wins.values())
                out["per_guide"] = {
                    str(g): {
                        "wins": wins[g],
                        "win_rate": 100.0 * wins[g] / n_attr,
                        "successes_when_winning": win_success[g],
                    } for g in sorted(wins)
                }
        if costs_by_guide and "per_guide" in out:
            out["per_guide_min_cost_mean"] = {
                str(g): float(np.mean(cs))
                for g, cs in sorted(costs_by_guide.items())
            }
        if self.timings:
            out["timing"] = {
                "scenes_timed": len(self.timings),
                "mean_plan_s": float(np.mean(
                    [t["plan"] for t in self.timings])),
                "mean_oracle_s": float(np.mean(
                    [t["oracle"] for t in self.timings])),
            }
        # aggregate the full-evaluation protocol when present
        with_metrics = [r["metrics"] for r in self.completed.values()
                        if r.get("metrics")]
        if with_metrics:
            n = len(with_metrics)
            out["protocol"] = {
                "n": n,
                "success_rate": 100.0 * sum(
                    m["protocol_success"] for m in with_metrics) / n,
                "within_1cm": 100.0 * sum(
                    m["position_error"] < 0.01 for m in with_metrics) / n,
                "within_5cm": 100.0 * sum(
                    m["position_error"] < 0.05 for m in with_metrics) / n,
                "within_15deg": 100.0 * sum(
                    m["orientation_error"] < 15 for m in with_metrics) / n,
                "within_30deg": 100.0 * sum(
                    m["orientation_error"] < 30 for m in with_metrics) / n,
                "correct_region": 100.0 * sum(
                    m.get("correct_final_region", True)
                    for m in with_metrics) / n,
                "region_checked": 100.0 * sum(
                    m.get("region_checked", False)
                    for m in with_metrics) / n,
                "mean_ee_path_length": float(np.mean(
                    [m["ee_path_length"] for m in with_metrics])),
                "mean_joint_smoothness": float(np.mean(
                    [m["joint_smoothness"] for m in with_metrics])),
            }
        return out


def _violation_names(mask: int):
    """Spool field: decoded violation classes, or None for clean samples."""
    if not mask:
        return None
    from edmp_tpu.costs.assist import violation_class_names

    return violation_class_names(mask)


def _ik_targets_fn():
    """jitted (targets (S,4,4), q7 seeds (S, n)) -> goals (S, n*8, 7), valid."""

    def one(target, seeds):
        sols, ok = IK.analytic_ik_batch(target, seeds)
        return sols.reshape(-1, 7), ok.reshape(-1)

    return jax.jit(jax.vmap(one))


def run_sweep(
    model,
    params,
    schedule: DiffusionSchedule,
    guide: GuideParams,
    dataset: PackedDataset,
    plan_cfg: P.PlannerConfig,
    sweep_cfg: SweepConfig,
    tag: str = "run",
    max_scenes: Optional[int] = None,
    mesh=None,
    guide_ids: Optional[List[int]] = None,
    scene_index_offset: int = 0,
    plan_fn=None,
) -> SweepState:
    """Run (or resume) the sweep.

    ``mesh``: shard the scene batch over all local devices (scenes axis);
    single-device behaviour is unchanged when None.  ``guide_ids``: enables
    per-guide ensemble attribution in the spool/summary (winning guide id +
    per-guide min swept cost; batch layout H guides x B/H samples,
    infer_serial.py:56-91).  ``scene_index_offset``: global index of this
    dataset's first scene (multi-host slices) — all per-scene randomness is
    keyed by GLOBAL scene index, so a host planning its slice reproduces the
    single-process run scene-for-scene (proven in tests/test_multihost.py).
    ``plan_fn``: a prebuilt make_batched_plan_fn result to reuse across
    run_sweep calls — guide hyperparameters are ARGUMENTS of the jitted
    program, so e.g. tools/ensemble_study.py sweeps many guide configs on
    ONE compile.
    """
    state = SweepState(sweep_cfg.results_dir, tag)
    rng = np.random.default_rng(sweep_cfg.seed)

    indices = np.arange(len(dataset))
    if max_scenes is not None:
        indices = indices[:max_scenes]
    ladder = sweep_cfg.retry_ladder or []
    n_retry_rounds = max(sweep_cfg.retry_failed, len(ladder))
    pending = state.pending(indices)
    if len(pending) == 0 and not n_retry_rounds:
        return state

    Sb = sweep_cfg.scenes_per_batch
    if mesh is not None and Sb % mesh.size != 0:
        Sb = -(-Sb // mesh.size) * mesh.size  # pad up to a mesh multiple

    if plan_fn is None:
        plan_fn = P.make_batched_plan_fn(model, schedule, plan_cfg, mesh=mesh)
    ik_fn = _ik_targets_fn()
    # dataset-aware obstacle padding: the guidance adjoint is VPU-bound and
    # its work is LINEAR in the padded obstacle count, so padding to the
    # dataset's true maximum (not the global MAX_OBSTACLES=24 ceiling)
    # directly buys throughput — e.g. 8-obstacle scenes do 3x less guidance
    # math.  Rounded up to a multiple of 4 to limit distinct program shapes.
    o_pad = int(dataset.n_obstacles.max()) if len(dataset) else 1
    o_pad = max(-(-o_pad // 4) * 4, 4)
    oracle = TrajectoryOracle(substeps=sweep_cfg.substeps)
    evaluator = None
    if sweep_cfg.full_evaluation:
        from edmp_tpu.metrics.evaluator import Evaluator

        evaluator = Evaluator(substeps=sweep_cfg.substeps)
    # exposed for group save/aggregate (Evaluator.save/from_files) and for
    # asserting retry replacement semantics; None unless full_evaluation
    state.evaluator = evaluator

    # bounded: at 20+ scenes/s with --evaluate the oracle thread can lag the
    # dispatcher arbitrarily; backpressure (put blocks) caps the host-memory
    # footprint at a few batches of trajectories instead of the whole sweep
    results_q: "queue.Queue" = queue.Queue(maxsize=4 * max(Sb, 1))
    validator_errors: List[BaseException] = []

    H = len(guide_ids) if guide_ids else 0

    def _make_pg_min(bpg_r):
        # per-guide min swept cost, computed on DEVICE from the (sharded)
        # cost matrix — host code only formats the result
        return jax.jit(
            lambda c: c.reshape(c.shape[0], H, bpg_r).min(axis=2)) \
            if H else None

    class _Round:
        """Per-attempt planning resources (the retry ladder's escalation)."""

        def __init__(self, plan_fn, guide_r, Sb_r, bpg_r):
            self.plan_fn = plan_fn
            self.guide = guide_r
            self.Sb = Sb_r
            self.bpg = bpg_r
            self.pg_min_fn = _make_pg_min(bpg_r)

    def _tile_blocks(a, mult):
        """Repeat each guide's row-block ``mult`` times (or the whole array
        when no guide attribution is active)."""
        if a is None or mult == 1:
            return a
        if H:
            a2 = a.reshape((H, -1) + a.shape[1:])
            return jnp.repeat(a2, mult, axis=1).reshape(
                (-1,) + a.shape[1:])
        return jnp.tile(a, (mult,) + (1,) * (a.ndim - 1))

    base_round = _Round(plan_fn, guide, Sb,
                        plan_cfg.batch_size // H if H else 0)
    _round_cache: Dict[int, _Round] = {0: base_round}

    def _round(attempt: int) -> _Round:
        if attempt in _round_cache:
            return _round_cache[attempt]
        spec = ladder[min(attempt - 1, len(ladder) - 1)] if ladder else None
        if spec is None:
            r = base_round  # reseed-only retry: identical program
        else:
            mult = max(spec.batch_mult, 1)
            g = GuideParams(*[_tile_blocks(a, mult) for a in guide])
            if spec.clearance_bump:
                g = g._replace(clearance=g.clearance + spec.clearance_bump)
            B_r = plan_cfg.batch_size * mult
            if spec.env_clearance_weight:
                g = g._replace(env_clearance_weight=jnp.full(
                    B_r, spec.env_clearance_weight, jnp.float32))
            cfg_r = dataclasses.replace(
                plan_cfg, batch_size=B_r,
                sampler=spec.sampler or plan_cfg.sampler,
                ddim_steps=spec.ddim_steps or plan_cfg.ddim_steps)
            Sb_r = spec.scenes_per_batch or Sb
            if mesh is not None and Sb_r % mesh.size != 0:
                Sb_r = -(-Sb_r // mesh.size) * mesh.size
            same_cfg = (cfg_r == plan_cfg and Sb_r == Sb
                        and all(a is b for a, b in zip(g, guide)))
            fn_r = plan_fn if same_cfg else P.make_batched_plan_fn(
                model, schedule, cfg_r, mesh=mesh)
            r = _Round(fn_r, g, Sb_r, cfg_r.batch_size // H if H else 0)
        _round_cache[attempt] = r
        return r

    def _strictness(rec: dict):
        """Ordering key for retry replacement: strict protocol success, then
        oracle success, then lower PENALIZED cost (raw swept volume plus the
        safety selection penalty — the same metric selection minimizes)."""
        m = rec.get("metrics")
        if m is not None:
            strict = bool(m["protocol_success"])
        else:
            # metrics-less records (resumed from a --evaluate-less spool)
            # count as strict failures under full_evaluation so a retry can
            # backfill their protocol metrics
            strict = bool(rec["success"]) and not sweep_cfg.full_evaluation
        cost = float(rec["swept_cost"]) + float(
            rec.get("selection_penalty") or 0.0)
        return (strict, bool(rec["success"]), -cost)

    # scene index -> position of its evaluation in evaluator.results, so a
    # winning retry REPLACES the protocol entry instead of double-counting
    eval_pos: Dict[int, int] = {}

    def _validate_and_record(item):
        (idx, best, goal, cost, dt, winning_guide, pg_min_row, sel_pen,
         sel_mask, ik_fb, attempt) = item
        if attempt and ik_fb == "failed":
            # a retry whose fresh IK seeds failed planned toward a garbage
            # masked-argmin goal; discard it instead of letting it compete
            # for replacement (it could displace a valid-goal record and
            # then be excluded from later rounds as an IK skip)
            return
        if evaluator is not None and ik_fb == "failed" and attempt == 0:
            evaluator.record_skip(int(idx), "no_ik_solution")
        obs_cfg = dataset.scene_obstacle_config(int(idx))
        t_oracle = time.perf_counter()
        ok, _ = oracle.validate(best, obs_cfg)
        oracle_dt = time.perf_counter() - t_oracle
        metrics = None
        if evaluator is not None:
            i = int(idx)
            ev = evaluator.evaluate_trajectory(
                best, np.asarray(dataset.target[i], np.float64),
                obs_cfg, planning_time=float(dt),
                target_volume=np.asarray(dataset.target_volume[i], np.float64),
                negative_volumes=np.asarray(
                    dataset.negative_volumes[i, :dataset.n_negative[i]],
                    np.float64))
            metrics = {
                "position_error": ev.position_error,
                "orientation_error": ev.orientation_error,
                "protocol_success": ev.success,
                "correct_final_region": ev.correct_final_region,
                "region_checked": ev.region_checked,
                "env_collision": ev.env_collision,
                "self_collision": ev.self_collision,
                "joint_limit_violation": ev.joint_limit_violation,
                "joint_smoothness": ev.joint_smoothness,
                "ee_smoothness": ev.ee_smoothness,
                "joint_path_length": ev.joint_path_length,
                "ee_path_length": ev.ee_path_length,
            }
        st_id = int(dataset.scene_type_id[int(idx)])
        per_guide_cost = None
        if H:
            per_guide_cost = {str(g): float(c)
                              for g, c in zip(guide_ids, pg_min_row)}
        result = SceneResult(
            scene_index=int(idx),
            scene_type=SCENE_TYPES[st_id] if 0 <= st_id < 4 else "unknown",
            success=bool(ok),
            swept_cost=float(cost),
            plan_time=float(dt),
            goal=[float(x) for x in goal],
            metrics=metrics,
            winning_guide=winning_guide,
            per_guide_min_cost=per_guide_cost,
            ik_fallback=ik_fb,
            attempt=int(attempt),
            selection_penalty=float(sel_pen),
            violation_classes=_violation_names(int(sel_mask)),
        )
        if attempt:
            prev = state.completed.get(int(idx))
            keep_new = prev is None or _strictness(
                dataclasses.asdict(result)) > _strictness(prev)
            if evaluator is not None and metrics is not None:
                ev = evaluator.results.pop()  # this attempt's evaluation
                if keep_new:
                    if int(idx) in eval_pos:
                        evaluator.results[eval_pos[int(idx)]] = ev
                    else:
                        # covers resumed runs whose attempt-0 evaluations
                        # live in a prior process's evaluator: this process
                        # holds no entry for the scene yet (eval_pos empty),
                        # so the winning retry appends its first one
                        eval_pos[int(idx)] = len(evaluator.results)
                        evaluator.results.append(ev)
            if not keep_new:
                state.timings.append(
                    {"plan": float(dt), "oracle": oracle_dt})
                return  # retry not better: keep the spooled record
        elif evaluator is not None and metrics is not None:
            eval_pos[int(idx)] = len(evaluator.results) - 1
        state.record(result)
        state.timings.append({"plan": float(dt), "oracle": oracle_dt})

    def validator():
        while True:
            item = results_q.get()
            if item is None:
                results_q.task_done()
                return
            try:
                _validate_and_record(item)
            except BaseException as e:  # keep draining; re-raised at join
                validator_errors.append(e)
            finally:
                results_q.task_done()

    worker = None
    if sweep_cfg.oracle_threads:
        worker = threading.Thread(target=validator, daemon=True)
        worker.start()

    def record_host(item):
        if worker is not None:
            results_q.put(item)
            return
        _validate_and_record(item)

    def dispatch(chunk, attempt=0):
        """Enqueue one chunk's device work (async — no host sync here)."""
        rr = _round(attempt)
        pad = rr.Sb - len(chunk)
        idx = np.concatenate([chunk, np.repeat(chunk[-1:], pad)])
        scenes = stack_scenes(
            [pack_scene(dataset.scene_obstacle_config(int(i)),
                        max_obstacles=o_pad) for i in idx])
        starts = jnp.asarray(dataset.q0[idx], jnp.float32)
        targets = jnp.asarray(dataset.target[idx], jnp.float32)
        # q7 sweep seeds keyed by (sweep seed, GLOBAL scene index): identical
        # regardless of chunk order, resume point, or host slice
        def _scene_seeds(i):
            # attempt==0 keeps the historical (seed, global_index) keying so
            # existing spools stay scene-for-scene reproducible; retries add
            # the round to the key for fresh IK q7 seeds
            key = ((sweep_cfg.seed, int(i) + scene_index_offset) if not attempt
                   else (sweep_cfg.seed, attempt, int(i) + scene_index_offset))
            r = np.random.default_rng(key)
            return np.concatenate([
                r.uniform(-C.Q7_RANGE, C.Q7_RANGE, sweep_cfg.n_q7_seeds // 2),
                np.linspace(-C.Q7_RANGE, C.Q7_RANGE,
                            sweep_cfg.n_q7_seeds - sweep_cfg.n_q7_seeds // 2),
            ])
        seeds = np.stack([_scene_seeds(i) for i in idx])
        goals, valid = ik_fn(targets, jnp.asarray(seeds, jnp.float32))
        # analytic-IK dropout fallback: targets whose q7 sweep yields no
        # branch passing the FK-residual gate (possible for hard
        # orientations; the reference's 'solvable problems' sets rule this
        # out by construction) get a damped-least-squares solution instead
        # of a garbage masked-argmin goal.
        no_ik = ~np.asarray(jnp.any(valid, axis=1))
        ik_status: Dict[int, str] = {}
        if no_ik.any():
            from edmp_tpu.robot.ik import numerical_ik

            nik = jax.jit(numerical_ik)
            lo = np.asarray(C.FRANKA_LOWER)
            hi = np.asarray(C.FRANKA_UPPER)
            for row in np.nonzero(no_ik)[0]:
                best_q, best_err = None, np.inf
                for k in range(6):
                    q0 = (0.5 * (lo + hi) if k == 0 else
                          lo + rng.uniform(0.2, 0.8, 7) * (hi - lo))
                    q, err = nik(targets[row], jnp.asarray(q0, jnp.float32))
                    if float(err) < best_err:
                        best_q, best_err = q, float(err)
                if best_err < 5e-3:
                    goals = goals.at[row, 0].set(best_q)
                    valid = valid.at[row, 0].set(True)
                    ik_status[int(row)] = "dls"
                else:
                    ik_status[int(row)] = "failed"
        sub = jax.random.fold_in(jax.random.key(sweep_cfg.seed),
                                 int(chunk[0]) + scene_index_offset)
        if attempt:  # fresh sampling noise per retry round
            sub = jax.random.fold_in(sub, attempt)
        res = rr.plan_fn(params, scenes, rr.guide, starts, goals, valid, sub)
        return chunk, res, time.perf_counter(), ik_status, attempt

    def drain(inflight):
        """Materialize one dispatched chunk and hand results to the oracle."""
        chunk, res, t0, ik_status, attempt = inflight
        rr = _round(attempt)
        best = np.asarray(res.best)       # blocks until the device finishes
        goal_np = np.asarray(res.goal)
        best_idx = np.asarray(res.best_index)
        costs = np.asarray(res.swept_costs)          # (S, B) RAW swept
        pens = np.asarray(res.penalties)
        masks = np.asarray(res.violation_mask)
        if H:
            pg_min = np.asarray(rr.pg_min_fn(res.swept_costs))  # (S, H)
        else:
            pg_min = costs.min(axis=1, keepdims=True)
        dt = (time.perf_counter() - t0) / max(len(chunk), 1)
        rows = np.arange(costs.shape[0])
        sel_cost = costs[rows, best_idx]
        sel_pen = pens[rows, best_idx]
        sel_mask = masks[rows, best_idx]
        for row, scene_i in enumerate(chunk):
            winning_guide = (int(guide_ids[int(best_idx[row]) // rr.bpg])
                             if H else None)
            record_host((scene_i, best[row], goal_np[row],
                         sel_cost[row], dt, winning_guide, pg_min[row],
                         sel_pen[row], sel_mask[row],
                         ik_status.get(row), attempt))

    def run_pass(idxs, attempt=0):
        # one-deep dispatch pipeline: chunk k+1's host prep + device enqueue
        # overlap chunk k's device execution and oracle validation
        Sb_r = _round(attempt).Sb
        chunks = [idxs[lo:lo + Sb_r] for lo in range(0, len(idxs), Sb_r)]
        inflight = None
        for chunk in chunks:
            nxt = dispatch(chunk, attempt)
            if inflight is not None:
                drain(inflight)
            inflight = nxt
        if inflight is not None:
            drain(inflight)

    def failed_indices():
        """Scenes (from this run's index set) whose current record is a
        failure — strict protocol when full_evaluation, else the oracle.
        IK-skip scenes are excluded (no goal to replan toward).  Under
        full_evaluation, records WITHOUT metrics (resumed from a spool
        written without --evaluate) are retry candidates too: re-planning
        them backfills their protocol metrics (and _strictness treats them
        as strict failures, so a metrics-carrying retry can replace them)."""
        out = []
        for i in indices:
            rec = state.completed.get(int(i))
            if rec is None or rec.get("ik_fallback") == "failed":
                continue
            m = rec.get("metrics")
            if sweep_cfg.full_evaluation:
                ok = bool(m["protocol_success"]) if m else False
            else:
                ok = rec["success"]
            if not ok:
                out.append(int(i))
        return np.asarray(out, np.int64)

    run_pass(pending, 0)
    for attempt in range(1, n_retry_rounds + 1):
        if worker is not None:
            results_q.join()  # completed must reflect the previous pass
        retry = failed_indices()
        if len(retry) == 0:
            break
        run_pass(retry, attempt)

    if worker is not None:
        results_q.put(None)
        worker.join()
    if validator_errors:
        raise RuntimeError(
            f"{len(validator_errors)} scene(s) failed validation; first "
            f"error follows") from validator_errors[0]

    if mesh is not None and H:
        # per-guide win/success statistics reduced ON DEVICE (psum over the
        # scenes axis, collectives.make_per_guide_tally) — summary() sources
        # its per-guide table from this instead of re-deriving host-side
        from edmp_tpu.parallel.collectives import make_per_guide_tally

        id_to_pos = {g: i for i, g in enumerate(guide_ids)}
        recs = list(state.completed.values())
        win_idx = np.asarray(
            [id_to_pos.get(r.get("winning_guide"), -1) for r in recs],
            np.int32)
        succ = np.asarray([bool(r["success"]) for r in recs], np.int32)
        pad = -len(recs) % mesh.size
        win_idx = np.concatenate([win_idx, np.full(pad, -1, np.int32)])
        succ = np.concatenate([succ, np.zeros(pad, np.int32)])
        wins, succ_win, total = make_per_guide_tally(mesh, H)(
            jnp.asarray(win_idx), jnp.asarray(succ))
        wins, succ_win = np.asarray(wins), np.asarray(succ_win)
        state.device_per_guide = {
            int(g): {"wins": int(wins[i]),
                     "successes_when_winning": int(succ_win[i])}
            for i, g in enumerate(guide_ids)}
        state.device_success_total = int(total)
    return state
