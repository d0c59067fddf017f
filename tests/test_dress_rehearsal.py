"""CI coverage of the real-artifact dress rehearsal (tools/dress_rehearsal):
fabricated reference-format checkpoint + pickle drive convert -> infer
--evaluate end to end at toy sizes, so the mechanics of real-artifact day
stay proven on every run."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_checkpoint_fabrication_matches_converter(tmp_path):
    """The fabricated weights_latest.pt must carry the exact key set the
    converter maps (proving the converter against the reference's own module
    tree, temporalunet.py:78-100)."""
    from edmp_tpu.models.convert import torch_state_dict_to_params
    from tools.dress_rehearsal import fabricate_checkpoint

    model_dir = fabricate_checkpoint(str(tmp_path), T=255, traj_len=50)
    assert model_dir.endswith("TemporalUNetModel255_N50")
    sd = torch.load(os.path.join(model_dir, "weights_latest.pt"),
                    map_location="cpu", weights_only=True)
    params = torch_state_dict_to_params(
        {k: np.asarray(v) for k, v in sd.items()})
    # spot shapes: first down conv (7 -> 32, k5) and final 1x1 (32 -> 7)
    leaf = params["down_0"]["rcb1"]["block1"]["conv"]["kernel"]
    assert leaf.shape == (5, 7, 32)
    assert params["final_conv"]["kernel"].shape == (1, 32, 7)
    assert os.path.exists(os.path.join(model_dir, "losses.npy"))


def test_rehearsal_end_to_end(tmp_path):
    """Fabricate both artifact kinds, convert the pickle, run the sweep with
    --evaluate, and check every scene spooled with protocol metrics."""
    from tools.dress_rehearsal import run

    # toy T but the CANONICAL horizon: the 6-level UNet's crop rules are
    # authored for the 50 -> 25 -> 13 -> 7 -> 4 -> 2 pyramid
    out = run(str(tmp_path), T=16, traj_len=50, n_per_cell=1,
              scenes_per_batch=6, guide_ids=(1, 11), batch_per_guide=2)
    assert out["n_scenes"] == 12  # 4 scene types x 3 problem types x 1
    recs = [json.loads(l) for l in open(out["spool"])]
    assert {r["scene_type"] for r in recs} == {
        "tabletop", "cubby", "merged_cubby", "dresser"}
    for r in recs:
        assert r["metrics"] is not None
        assert "protocol_success" in r["metrics"]
        assert np.isfinite(r["metrics"]["position_error"])
    # resume contract: a second run must be a no-op summary
    import io
    from contextlib import redirect_stdout

    from edmp_tpu.cli import infer as infer_cli

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = infer_cli.main(["-c", os.path.join(str(tmp_path), "cfg.yaml"),
                             "--dataset-npz", out["npz"],
                             "--results-dir",
                             os.path.join(str(tmp_path), "results"),
                             "--tag", "rehearsal", "--evaluate"])
    assert rc in (0, None)
    text = buf.getvalue()
    summary = json.loads(text[text.index("{"):])  # skip the dataset prints
    assert summary["resumed"] is True
