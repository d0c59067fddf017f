"""Benchmark sweep CLI — the TPU counterpart of ``python infer_serial.py -c``.

Reads the reference's benchmark YAML format (guides list, batch size, dataset
type/path, model dir, infer_serial.py:25-91) and runs the resumable sharded
sweep.  Dataset resolution order:
  1. ``--dataset-npz`` packed arrays (produced by cli.convert)
  2. ``<dataset.path>/<type>_solvable_problems.pkl`` (reference pickles,
     ingested through the shim unpickler)
  3. ``--synthetic N`` random problems (smoke/benchmarks)

Model weights resolve from ``<model_dir>/TemporalUNetModel<T>_N<len>/``
(weights_latest.pt or .npz via the converter); ``--random-weights`` runs with
an untrained model for pipeline benchmarking.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="edmp-infer")
    ap.add_argument("-c", "--cfg_path", default="./benchmark/cfgs/cfg1.yaml")
    ap.add_argument("--dataset-npz", default=None)
    ap.add_argument("--synthetic", type=int, default=None,
                    help="run N synthetic scenes instead of a dataset")
    ap.add_argument("--scenes-per-batch", type=int, default=16,
                    help="scene fold size S (measured flat top on v5e is "
                    "S=21-25; 16 balances throughput vs partial-batch "
                    "padding — docs/roofline.md S-scaling)")
    ap.add_argument("--max-scenes", type=int, default=None)
    ap.add_argument("--scene-types", nargs="*", default=None,
                    help="override cfg scene types")
    ap.add_argument("--tag", default=None)
    ap.add_argument("--results-dir", default=None)
    ap.add_argument("--substeps", type=int, default=8,
                    help="oracle segment densification (calibration: "
                    "docs/oracle_calibration.md)")
    ap.add_argument("--evaluate", action="store_true",
                    help="run the full MPiNets metric protocol per scene")
    ap.add_argument("--retry-failed", type=int, default=0,
                    help="reseed-retry rounds over failed scenes (fresh "
                    "sampling noise + IK seeds; a retry replaces the spooled "
                    "record only when strictly better)")
    ap.add_argument("--retry-ladder", default=None,
                    help="escalating retry ladder, e.g. "
                    "'mult=2;mult=4,clear=0.02,envw=0.3,sampler=ddpm' — "
                    "round k uses entry k (knobs: mult=batch multiplier, "
                    "clear=clearance bump m, envw=SDF-clearance weight, "
                    "sampler, steps, spb).  Implies at least that many "
                    "retry rounds")
    ap.add_argument("--sampler", choices=["ddpm", "ddim"], default="ddpm")
    ap.add_argument("--ddim-steps", type=int, default=32)
    ap.add_argument("--ddim-guidance-period", type=int, default=1,
                    help="apply guidance every k-th coarse DDIM step "
                    "(docs/ddim_cadence.md: 2 matches DDPM quality)")
    ap.add_argument("--guidance-engine", default="auto",
                    choices=["auto", "manual", "pallas", "fast"])
    ap.add_argument("--assist-sc", type=float, default=None,
                    help="enable the self-collision capsule-hinge guidance "
                    "term at this weight for ALL samples (costs/assist.py; "
                    "calibration: docs/assist_study.md)")
    ap.add_argument("--assist-jl", type=float, default=None,
                    help="enable the joint-limit hinge guidance term at "
                    "this weight for ALL samples")
    ap.add_argument("--assist-clear", type=float, default=None,
                    help="enable the exact-SDF environment-clearance hinge "
                    "(costs/clearance.py) at this step weight for ALL "
                    "samples")
    ap.add_argument("--clearance-bump", type=float, default=None,
                    help="additive bump (m) on every guide's obstacle-"
                    "clearance schedule — the conservative-margin mode for "
                    "link-geometry uncertainty "
                    "(docs/link_dims_sensitivity.md)")
    ap.add_argument("--sc-filter-goals", action="store_true",
                    help="reject self-colliding IK goal candidates before "
                    "the trust-region filter (docs/assist_study.md)")
    ap.add_argument("--safe-selection", action="store_true",
                    help="best-of-batch selection penalizes self-collision/"
                    "joint-limit violations (any clean sample beats every "
                    "dirty one)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--weights-npz", default=None,
                    help="Flax params npz (from cli.train export)")
    # multi-host launch (jax.distributed): run the same command on every
    # host with its own --process-id; scenes shard per host
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 for multi-host runs")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from edmp_tpu import planner as P
    from edmp_tpu.config import BenchmarkConfig, load_guide_set, pack_ensemble
    from edmp_tpu.data.problems import PackedDataset
    from edmp_tpu.data.synthetic import synthetic_packed_dataset
    from edmp_tpu.diffusion.schedule import make_schedule
    from edmp_tpu.models import convert as cv
    from edmp_tpu.models import temporal_unet as tu
    from edmp_tpu.parallel.sweep import SweepConfig, run_sweep

    from edmp_tpu.parallel.mesh import (multihost_initialize,
                                        process_scene_slice)

    multihost_initialize(args.coordinator, args.num_processes,
                         args.process_id)

    cfg = BenchmarkConfig.from_yaml(args.cfg_path)
    guides = load_guide_set(cfg.guide_path, cfg.guide_ids)
    gp, _ = pack_ensemble(guides, cfg.batch_size_per_guide, cfg.T)
    if args.assist_sc is not None or args.assist_jl is not None:
        B = cfg.total_batch_size
        gp = gp._replace(
            self_collision_weight=(jnp.full(B, args.assist_sc, jnp.float32)
                                   if args.assist_sc else None),
            joint_limit_weight=(jnp.full(B, args.assist_jl, jnp.float32)
                                if args.assist_jl else None))
    if args.assist_clear:
        gp = gp._replace(env_clearance_weight=jnp.full(
            cfg.total_batch_size, args.assist_clear, jnp.float32))
    if args.clearance_bump:
        gp = gp._replace(clearance=gp.clearance + args.clearance_bump)

    # dataset resolution FIRST (cheap) — model init/compile is minutes on a
    # tunneled chip, so fail fast on a missing dataset
    if args.dataset_npz:
        dataset = PackedDataset.load(args.dataset_npz)
    elif args.synthetic:
        dataset = synthetic_packed_dataset(
            np.random.default_rng(args.seed), args.synthetic)
    else:
        pkl = os.path.join(cfg.dataset_path,
                           f"{cfg.dataset_type}_solvable_problems.pkl")
        if not os.path.exists(pkl):
            print(f"[error] dataset not found: {pkl}. Pass --dataset-npz or "
                  f"--synthetic N.", file=sys.stderr)
            return 2
        from edmp_tpu.data.problems import (PackedDataset as PD,
                                            load_reference_pickle)
        by_type = load_reference_pickle(pkl)
        wanted = args.scene_types or cfg.scene_types
        problems = [p for st in wanted for p in by_type.get(st, [])]
        dataset = PD.from_problems(problems)
    # scene-subset rules from the cfg (num_scenes_per_type / random_scenes;
    # -1 keeps everything)
    if cfg.num_scenes_per_type is not None and cfg.num_scenes_per_type >= 0:
        sel = cfg.select_scene_indices(
            dataset.scene_type_id, np.random.default_rng(args.seed))
        dataset = dataset.select(sel)
        results_root = args.results_dir or cfg.save_dir
        if cfg.save_scene_indices:
            os.makedirs(results_root, exist_ok=True)
            with open(os.path.join(results_root, "scene_indices.json"),
                      "w") as f:
                json.dump([int(i) for i in sel], f)

    # per-host contiguous scene shard (multi-host data parallelism over the
    # dataset sweep; single-process runs keep the full range)
    import jax as _jax

    scene_index_offset = 0
    if _jax.process_count() > 1:
        sl = process_scene_slice(len(dataset))
        dataset = dataset.select(np.arange(sl.start, sl.stop))
        scene_index_offset = sl.start  # per-scene RNG keys stay GLOBAL
        print(f"host {_jax.process_index()}: scenes [{sl.start}, {sl.stop})")
    print(f"dataset: {len(dataset)} scenes")

    # resume early-exit: if every scene is already spooled, skip the
    # (expensive) model build entirely
    from edmp_tpu.parallel.sweep import SweepState

    results_dir = args.results_dir or cfg.save_dir
    tag = args.tag or f"{cfg.dataset_type}"
    if _jax.process_count() > 1:  # per-host spool on shared filesystems
        tag = f"{tag}_h{_jax.process_index()}"
    n_target = len(dataset) if args.max_scenes is None else min(
        len(dataset), args.max_scenes)
    probe = SweepState(results_dir, tag)
    # the early-exit must NOT trigger when retries are requested: resuming a
    # COMPLETED spool with --retry-failed/--retry-ladder is the production
    # way to re-attack its failures (run_sweep's retry loop handles it)
    if (args.retry_failed == 0 and args.retry_ladder is None
            and len(probe.pending(range(n_target))) == 0):
        summary = probe.summary()
        summary["resumed"] = True
        print(json.dumps(summary, indent=2))
        return 0

    model = tu.create_model(input_dim=cfg.num_channels)
    model_dir = os.path.join(
        cfg.model_dir, f"TemporalUNetModel{cfg.T}_N{cfg.traj_len}")
    if args.weights_npz:
        from edmp_tpu.utils.checkpoint import load_inference_weights

        params = jax.tree.map(jnp.asarray,
                              load_inference_weights(args.weights_npz))
        print(f"loaded weights from {args.weights_npz}")
    elif args.random_weights or not os.path.exists(model_dir):
        if not args.random_weights:
            print(f"[warn] no checkpoint at {model_dir}; using random init "
                  f"(pass --random-weights to silence)", file=sys.stderr)
        params = tu.init_params(jax.random.key(0), model,
                                traj_len=cfg.traj_len)
    else:
        params = jax.tree.map(jnp.asarray,
                              cv.load_torch_checkpoint(model_dir))
        print(f"loaded checkpoint from {model_dir}")

    plan_cfg = P.PlannerConfig(batch_size=cfg.total_batch_size,
                               traj_len=cfg.traj_len,
                               num_channels=cfg.num_channels,
                               sampler=args.sampler,
                               ddim_steps=args.ddim_steps,
                               ddim_guidance_period=args.ddim_guidance_period,
                               guidance_engine=args.guidance_engine,
                               sc_filter_goals=args.sc_filter_goals,
                               safety_aware_selection=args.safe_selection)
    from edmp_tpu.parallel.sweep import parse_retry_ladder

    sweep_cfg = SweepConfig(
        scenes_per_batch=args.scenes_per_batch,
        substeps=args.substeps,
        seed=args.seed,
        results_dir=results_dir,
        full_evaluation=args.evaluate,
        retry_failed=args.retry_failed,
        retry_ladder=(parse_retry_ladder(args.retry_ladder)
                      if args.retry_ladder else None),
    )

    # all local chips participate: scenes shard over a 1-axis mesh (the
    # single-device case degenerates to the plain jit path)
    mesh = None
    if jax.local_device_count() > 1:
        from edmp_tpu.parallel.mesh import make_local_mesh

        mesh = make_local_mesh()
        print(f"mesh: {mesh.size} devices on '{mesh.axis_names[0]}'")

    t0 = time.time()
    state = run_sweep(model, params, make_schedule(cfg.T), gp, dataset,
                      plan_cfg, sweep_cfg, tag=tag,
                      max_scenes=args.max_scenes, mesh=mesh,
                      guide_ids=cfg.guide_ids,
                      scene_index_offset=scene_index_offset)
    dt = time.time() - t0
    summary = state.summary()
    summary["wall_time_s"] = round(dt, 2)
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
