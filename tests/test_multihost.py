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


def _run_single(cfg_path, results, tag, n_scenes, extra=None):
    cmd = _infer_cmd(str(cfg_path), results, tag, extra or [])
    # patch the --synthetic count in place
    cmd[cmd.index("--synthetic") + 1] = str(n_scenes)
    p = subprocess.run(cmd, cwd=REPO, env=_env(), capture_output=True,
                       text=True, timeout=800)
    assert p.returncode == 0, p.stderr[-3000:]
    return p.stdout


def _run_procs(cfg_path, results, tag, n_scenes, n_procs, extra=None):
    port = _free_port()
    procs = []
    for pid in range(n_procs):
        e = (extra or []) + ["--coordinator", f"127.0.0.1:{port}",
                             "--num-processes", str(n_procs),
                             "--process-id", str(pid)]
        cmd = _infer_cmd(str(cfg_path), results, tag, e)
        cmd[cmd.index("--synthetic") + 1] = str(n_scenes)
        procs.append(subprocess.Popen(cmd, cwd=REPO, env=_env(),
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=800)
        outs.append((p.returncode, out, err))
    for rc, _, err in outs:
        assert rc == 0, err[-3000:]
    return outs


def test_four_process_uneven_slices_partial_then_resume(tmp_path):
    """4 hosts over 10 scenes (uneven: 3/3/3/1); first pass killed mid-sweep
    (simulated via --max-scenes), partial spools merged, then a second pass
    RESUMES every host to completion and the merged result equals the
    single-process run — the elastic-recovery contract of SURVEY §5."""
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(CFG.format(save_dir=str(tmp_path / "results")))
    results = str(tmp_path / "results")
    n = 10

    _run_single(cfg_path, results, "single10", n)
    single = _read_spool(os.path.join(results, "sweep_single10.jsonl"))
    assert len(single) == n

    # phase 1: every host stops after 2 scenes (host 3 only owns 1)
    _run_procs(cfg_path, results, "m4", n, 4, extra=["--max-scenes", "2"])
    spools = [os.path.join(results, f"sweep_m4_h{r}.jsonl") for r in range(4)]
    sizes = [len(_read_spool(s)) for s in spools]
    assert sizes == [2, 2, 2, 1]  # partial; uneven tail slice

    sys.path.insert(0, REPO)
    from tools.merge_spools import merge, summarize

    partial = merge(spools, total_scenes=n)
    assert len(partial) == 7
    assert summarize(partial)["overall"]["n"] == 7
    got = {r["scene_index"] for r in partial}
    assert got == {0, 1, 3, 4, 6, 7, 9}  # global indices, offsets applied

    # phase 2: full rerun resumes each host from its spool
    outs = _run_procs(cfg_path, results, "m4", n, 4)
    sizes = [len(_read_spool(s)) for s in spools]
    assert sizes == [3, 3, 3, 1]
    merged = merge(spools, total_scenes=n)
    assert sorted(r["scene_index"] for r in merged) == list(range(n))
    for rec in merged:
        ref = single[rec["scene_index"]]
        assert rec["success"] == ref["success"], rec["scene_index"]
        np.testing.assert_allclose(rec["goal"], ref["goal"], atol=1e-5)


def test_kill9_mid_sweep_then_resume(tmp_path):
    """A real SIGKILL mid-sweep (torn tail writes possible) must leave a
    resumable spool: the rerun completes the remaining scenes with no
    duplicate indices and matches a clean run."""
    import signal
    import time

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(CFG.format(save_dir=str(tmp_path / "results")))
    results = str(tmp_path / "results")
    spool = os.path.join(results, "sweep_kill.jsonl")

    cmd = _infer_cmd(str(cfg_path), results, "kill",
                     ["--scenes-per-batch", "2"])
    p = subprocess.Popen(cmd, cwd=REPO, env=_env(),
                         stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 600
        while time.time() < deadline:
            if os.path.exists(spool) and len(_read_spool(spool)) >= 2:
                break
            if p.poll() is not None:
                break  # finished before we could kill: resume still tested
            time.sleep(0.3)
        if p.poll() is None:
            p.send_signal(signal.SIGKILL)
            p.wait(timeout=60)
    finally:
        if p.poll() is None:
            p.kill()

    n_before = len(_read_spool(spool)) if os.path.exists(spool) else 0

    q = subprocess.run(cmd, cwd=REPO, env=_env(), capture_output=True,
                       text=True, timeout=800)
    assert q.returncode == 0, q.stderr[-3000:]
    recs = _read_spool(spool)
    assert sorted(recs) == list(range(N_SCENES))
    # spool line count may exceed N_SCENES only by the torn tail; indices
    # must be unique after _read_spool's last-wins keying
    with open(spool) as f:
        lines = [l for l in f if l.strip()]
    assert len(lines) <= N_SCENES + 1
    # resumed run matches a clean single run scene-for-scene
    _run_single(cfg_path, results, "clean", N_SCENES)
    clean = _read_spool(os.path.join(results, "sweep_clean.jsonl"))
    for i in range(N_SCENES):
        assert recs[i]["success"] == clean[i]["success"]
        np.testing.assert_allclose(recs[i]["goal"], clean[i]["goal"],
                                   atol=1e-5)
    assert n_before <= N_SCENES


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
