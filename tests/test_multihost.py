"""Multi-host execution, virtually: 2 `jax.distributed` CPU processes on
localhost driven through the REAL cli.infer entry point
(--coordinator/--num-processes/--process-id), per-host scene slices and
spools, merged by tools/merge_spools — asserted scene-for-scene equal to a
single-process run on the same scenes.

This exercises the whole multi-host path of SURVEY §2.3 item 4
(multihost_initialize -> process_scene_slice -> per-host spool tags ->
cross-host merge) end-to-end at least once, as VERDICT r2 #3 demanded.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))

CFG = """\
guide:
  guides: [1, 2]
  batch_size_per_guide: 2
  guide_path: './guides/'
dataset:
  path: './datasets/'
  dataset_type: 'hybrid'
  scene_types: ['tabletop']
  num_scenes_per_type: -1
model:
  model_dir: './models/'
  T: 8
  traj_len: 50
  num_channels: 7
general:
  gui: False
  save_dir: '{save_dir}'
"""

N_SCENES = 8


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _infer_cmd(cfg_path, results_dir, tag, extra):
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); import sys; "
        "from edmp_tpu.cli.infer import main; sys.exit(main(sys.argv[1:]))"
    )
    return [sys.executable, "-c", code,
            "-c", cfg_path, "--synthetic", str(N_SCENES),
            "--random-weights", "--scenes-per-batch", "4",
            "--results-dir", results_dir, "--tag", tag] + extra


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # one CPU device per process: the pure multi-HOST path, no local mesh
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    # the axon sitecustomize initializes the PJRT backend at interpreter
    # start, which breaks jax.distributed.initialize ("must be called
    # before any JAX calls"); dropping its trigger var skips registration
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def _read_spool(path):
    recs = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            recs[rec["scene_index"]] = rec
    return recs


def test_two_process_multihost_equals_single(tmp_path):
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(CFG.format(save_dir=str(tmp_path / "results")))
    results = str(tmp_path / "results")

    # --- single-process reference run over all N_SCENES ---
    p = subprocess.run(
        _infer_cmd(str(cfg_path), results, "single", []),
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=800)
    assert p.returncode == 0, p.stderr[-3000:]
    single = _read_spool(os.path.join(results, "sweep_single.jsonl"))
    assert len(single) == N_SCENES

    # --- 2-process jax.distributed run, scenes sliced per host ---
    port = _free_port()
    procs = []
    for pid in range(2):
        extra = ["--coordinator", f"127.0.0.1:{port}",
                 "--num-processes", "2", "--process-id", str(pid)]
        procs.append(subprocess.Popen(
            _infer_cmd(str(cfg_path), results, "multi", extra),
            cwd=REPO, env=_env(), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=800)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-3000:]
    # both hosts printed their slice
    assert any("scenes [0, 4)" in o for _, o, _ in outs)
    assert any("scenes [4, 8)" in o for _, o, _ in outs)

    spools = [os.path.join(results, f"sweep_multi_h{r}.jsonl")
              for r in range(2)]
    for s in spools:
        assert os.path.exists(s), s
        assert len(_read_spool(s)) == 4  # per-host slice only

    # --- merge the per-host spools into one global spool + summary ---
    sys.path.insert(0, REPO)
    from tools.merge_spools import merge, summarize

    merged = merge(spools, total_scenes=N_SCENES)
    assert sorted(r["scene_index"] for r in merged) == list(range(N_SCENES))
    summary = summarize(merged)
    assert summary["overall"]["n"] == N_SCENES
    assert summary["hosts"] == [0, 1]

    # --- the merged multi-host result IS the single-process result ---
    for rec in merged:
        ref = single[rec["scene_index"]]
        assert rec["success"] == ref["success"], rec["scene_index"]
        assert rec["winning_guide"] == ref["winning_guide"]
        assert rec["swept_cost"] == pytest.approx(ref["swept_cost"],
                                                  rel=1e-4, abs=1e-6)
        np.testing.assert_allclose(rec["goal"], ref["goal"], atol=1e-5)
    assert summary["overall"]["successes"] == \
        sum(r["success"] for r in single.values())
