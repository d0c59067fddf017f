"""Checkpoint conversion: reference PyTorch TemporalUNet state_dict -> Flax.

The released EDMP checkpoint (``models/TemporalUNetModel255_N50/weights_latest.pt``,
README.md:53-58) stores the torch module tree of
``diffusion/models/temporalunet.py``.  This module maps those tensors onto the
Flax parameter tree of :mod:`edmp_tpu.models.temporal_unet` with the layout
transposes required by the NWC/feature-last convention:

  * ``nn.Linear``      (out, in)      -> Dense kernel (in, out)
  * ``nn.Conv1d``      (out, in, k)   -> Conv kernel (k, in, out)
  * ``nn.GroupNorm``   weight/bias    -> scale/bias (unchanged)
  * ``nn.ConvTranspose1d`` (in, out, k) -> pre-flipped lhs-dilated-conv kernel
    (k, in, out):  K[k', i, o] = W[i, o, k_size-1-k']

Accepts either a ``.pt`` file (requires torch) or an ``.npz``/dict of numpy
arrays keyed by the torch parameter names, so TPU-side inference never needs
torch installed.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping

import numpy as np


def _linear(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(sd[prefix + ".weight"].T),
        "bias": np.ascontiguousarray(sd[prefix + ".bias"]),
    }


def _conv1d(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(sd[prefix + ".weight"].transpose(2, 1, 0)),
        "bias": np.ascontiguousarray(sd[prefix + ".bias"]),
    }


def _groupnorm(sd, prefix):
    return {
        "scale": np.ascontiguousarray(sd[prefix + ".weight"]),
        "bias": np.ascontiguousarray(sd[prefix + ".bias"]),
    }


def _conv_transpose1d(sd, prefix):
    w = sd[prefix + ".weight"]  # (in, out, k)
    return {
        "kernel": np.ascontiguousarray(np.flip(w, axis=2).transpose(2, 0, 1)),
        "bias": np.ascontiguousarray(sd[prefix + ".bias"]),
    }


def _conv_block(sd, prefix):
    """torch Conv1dBlock: Sequential[0]=Conv1d, [2]=GroupNorm (blocks.py:22-28)."""
    return {
        "conv": _conv1d(sd, prefix + ".block.0"),
        "norm": _groupnorm(sd, prefix + ".block.2"),
    }


def _res_conv_block(sd, prefix):
    out = {
        "block1": _conv_block(sd, prefix + ".blocks.0"),
        "block2": _conv_block(sd, prefix + ".blocks.1"),
        "time_dense": _linear(sd, prefix + ".time_mlp.time_mlp.1"),
    }
    if prefix + ".residual_conv.weight" in sd:
        out["residual_conv"] = _conv1d(sd, prefix + ".residual_conv")
    return out


def torch_state_dict_to_params(sd: Mapping[str, np.ndarray],
                               num_levels: int = 6) -> Dict:
    """Build the Flax ``params`` tree from a torch state dict (numpy values)."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    params: Dict = {
        "time_embedding": {
            "dense1": _linear(sd, "time_embedding.time_mlp.1"),
            "dense2": _linear(sd, "time_embedding.time_mlp.3"),
        }
    }
    for i in range(num_levels):
        blk = {
            "rcb1": _res_conv_block(sd, f"down_samplers.{i}.down.0"),
            "rcb2": _res_conv_block(sd, f"down_samplers.{i}.down.1"),
        }
        if f"down_samplers.{i}.down.3.weight" in sd:  # absent on is_last level
            blk["downconv"] = _conv1d(sd, f"down_samplers.{i}.down.3")
        params[f"down_{i}"] = blk
    params["middle"] = {
        "rcb1": _res_conv_block(sd, "middle_block.middle.0"),
        "rcb2": _res_conv_block(sd, "middle_block.middle.2"),
    }
    for i in range(num_levels - 1):
        params[f"up_{i}"] = {
            "rcb1": _res_conv_block(sd, f"up_samplers.{i}.up.0"),
            "rcb2": _res_conv_block(sd, f"up_samplers.{i}.up.1"),
            "upconv": _conv_transpose1d(sd, f"up_samplers.{i}.up.3"),
        }
    params["final_block"] = _conv_block(sd, "final_conv.0")
    params["final_conv"] = _conv1d(sd, "final_conv.1")
    return params


def load_torch_checkpoint(path: str) -> Dict:
    """Load ``weights_latest.pt`` (or an ``.npz`` export) into Flax params.

    Checkpoint dir layout parity: temporalunet.py:78-100.
    """
    if os.path.isdir(path):
        for cand in ("weights_latest.pt", "weights_latest.npz"):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                path = p
                break
        else:
            raise FileNotFoundError(f"no weights_latest.* under {path}")
    if path.endswith(".npz"):
        with np.load(path) as z:
            sd = {k: z[k] for k in z.files}
    else:
        import torch  # local import: torch only needed for .pt ingestion

        raw = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in raw.items()}
    return torch_state_dict_to_params(sd)


def export_npz(sd_path: str, out_path: str) -> None:
    """One-time host-side export: .pt -> .npz (torch-free artifact)."""
    import torch

    raw = torch.load(sd_path, map_location="cpu", weights_only=True)
    np.savez(out_path, **{k: v.numpy() for k, v in raw.items()})
