"""The in-repo config tree (benchmark/cfgs + guides/cfgs) vs the built-in
registry vs the REFERENCE's own YAML files.

Three-way agreement proves (a) the documented CLI default path works out of
the box, (b) the registry extraction from /root/reference/guides/cfgs is
verbatim for all 16 guides, and (c) YAML-loaded ensembles compile to the
exact per-sample arrays the kernels consume."""

import os

import numpy as np
import pytest

from edmp_tpu.config import (CFG1_GUIDE_IDS, REFERENCE_GUIDE_TABLE,
                             BenchmarkConfig, GuideConfig, load_guide_set,
                             pack_ensemble, reference_guide_configs)

REPO = os.path.join(os.path.dirname(__file__), os.pardir)
REF_GUIDES = "/root/reference/guides"

ALL_IDS = sorted(REFERENCE_GUIDE_TABLE)


def test_repo_guide_yamls_match_registry():
    loaded = load_guide_set(os.path.join(REPO, "guides"), ALL_IDS)
    for g, cfg in zip(ALL_IDS, loaded):
        assert cfg == reference_guide_configs([g])[0], f"guide{g}"


@pytest.mark.skipif(not os.path.isdir(REF_GUIDES),
                    reason="reference tree not present")
def test_registry_matches_reference_yamls_verbatim():
    for g in ALL_IDS:
        ref = GuideConfig.from_yaml(
            os.path.join(REF_GUIDES, "cfgs", f"guide{g}.yaml"))
        assert ref == reference_guide_configs([g])[0], f"guide{g}"


def test_cfg1_ensemble_packs_identically_from_yaml():
    yaml_guides = load_guide_set(os.path.join(REPO, "guides"), CFG1_GUIDE_IDS)
    gp_yaml, vtr_yaml = pack_ensemble(yaml_guides, 10)
    gp_reg, vtr_reg = pack_ensemble(
        reference_guide_configs(CFG1_GUIDE_IDS), 10)
    for a, b in zip(gp_yaml, gp_reg):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(vtr_yaml, vtr_reg)
    assert gp_yaml.batch == 120


@pytest.mark.parametrize("name,ids", [
    ("cfg1", CFG1_GUIDE_IDS), ("cfg2", [4, 5, 10]),
    ("cfg3", [11, 13, 14]), ("cfg4", [16, 18, 21]),
])
def test_benchmark_cfgs_load(name, ids):
    cfg = BenchmarkConfig.from_yaml(
        os.path.join(REPO, "benchmark", "cfgs", f"{name}.yaml"))
    assert cfg.guide_ids == ids
    assert cfg.batch_size_per_guide == 10
    assert cfg.T == 255 and cfg.traj_len == 50 and cfg.num_channels == 7
    assert cfg.total_batch_size == 10 * len(ids)
    # the guide files the cfg points at resolve inside the repo
    guides = load_guide_set(os.path.join(REPO, cfg.guide_path.lstrip("./")),
                            cfg.guide_ids)
    assert len(guides) == len(ids)


def test_scene_subset_rules():
    import numpy as np

    cfg = BenchmarkConfig.from_yaml(
        os.path.join(REPO, "benchmark", "cfgs", "cfg1.yaml"))
    ids = np.array([0, 0, 0, 1, 1, 2, 3, 3, 3, 3])
    # -1 (the shipped default) keeps everything
    np.testing.assert_array_equal(cfg.select_scene_indices(ids),
                                  np.arange(10))
    cfg2 = BenchmarkConfig(**{**cfg.__dict__, "num_scenes_per_type": 2})
    sel = cfg2.select_scene_indices(ids)
    assert list(ids[sel]).count(0) == 2 and list(ids[sel]).count(2) == 1
    assert list(sel) == sorted(sel)
    cfg3 = BenchmarkConfig(**{**cfg.__dict__, "num_scenes_per_type": 2,
                              "random_scenes": True})
    r = np.random.default_rng(0)
    sel3 = cfg3.select_scene_indices(ids, r)
    assert len(sel3) == len(sel)
