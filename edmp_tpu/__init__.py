"""EDMP-TPU: ensemble-of-costs guided diffusion motion planning, TPU-native.

Top-level convenience surface (lazily resolved so ``import edmp_tpu`` stays
cheap and jax-free until something is used):

    from edmp_tpu import plan, PlannerConfig, pack_ensemble, ...

The full API lives in the submodules (models/, diffusion/, costs/, robot/,
parallel/, data/, metrics/, validation/); see README.md for the map.
"""

__version__ = "0.2.0"

_LAZY = {
    # planning
    "plan": ("edmp_tpu.planner", "plan"),
    "plan_scenes": ("edmp_tpu.planner", "plan_scenes"),
    "PlannerConfig": ("edmp_tpu.planner", "PlannerConfig"),
    "make_plan_fn": ("edmp_tpu.planner", "make_plan_fn"),
    "make_batched_plan_fn": ("edmp_tpu.planner", "make_batched_plan_fn"),
    # config / ensemble
    "BenchmarkConfig": ("edmp_tpu.config", "BenchmarkConfig"),
    "GuideConfig": ("edmp_tpu.config", "GuideConfig"),
    "pack_ensemble": ("edmp_tpu.config", "pack_ensemble"),
    "load_guide_set": ("edmp_tpu.config", "load_guide_set"),
    "reference_guide_configs": ("edmp_tpu.config", "reference_guide_configs"),
    # model / sampler
    "create_model": ("edmp_tpu.models.temporal_unet", "create_model"),
    "TemporalUNet": ("edmp_tpu.models.temporal_unet", "TemporalUNet"),
    "load_torch_checkpoint": ("edmp_tpu.models.convert",
                              "load_torch_checkpoint"),
    "make_schedule": ("edmp_tpu.diffusion.schedule", "make_schedule"),
    "denoise_guided": ("edmp_tpu.diffusion.sampler", "denoise_guided"),
    # scenes / costs
    "SceneObstacles": ("edmp_tpu.costs.obstacles", "SceneObstacles"),
    "pack_scene": ("edmp_tpu.costs.obstacles", "pack_scene"),
    "GuideParams": ("edmp_tpu.costs.guide", "GuideParams"),
    # data / sweep / validation
    "PackedDataset": ("edmp_tpu.data.problems", "PackedDataset"),
    "load_reference_pickle": ("edmp_tpu.data.problems",
                              "load_reference_pickle"),
    "run_sweep": ("edmp_tpu.parallel.sweep", "run_sweep"),
    "SweepConfig": ("edmp_tpu.parallel.sweep", "SweepConfig"),
    "TrajectoryOracle": ("edmp_tpu.validation.oracle", "TrajectoryOracle"),
    # MPiNets policy baseline (L11)
    "MotionPolicyNetwork": ("edmp_tpu.models.policy", "MotionPolicyNetwork"),
    "MPiNetsPointNet": ("edmp_tpu.models.pointnet", "MPiNetsPointNet"),
    "RobotPointSampler": ("edmp_tpu.robot.point_sampler", "RobotPointSampler"),
}


def __getattr__(name):
    try:
        mod_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module 'edmp_tpu' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod_name), attr)


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
