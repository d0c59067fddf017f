"""Orbax checkpointing for training state (+ reference-compatible extras).

Improves on the reference's weights-only scheme (temporalunet.py:78-100):
full train state (params, optimizer, EMA, step) is checkpointed atomically
via orbax with retention, while ``losses.npy`` is still written next to the
checkpoints so the reference's bookkeeping convention carries over.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import orbax.checkpoint as ocp


class TrainCheckpointer:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval_steps: int = 1000):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )
        self._losses_path = os.path.join(self.directory, "losses.npy")
        self.losses = (np.load(self._losses_path).tolist()
                       if os.path.exists(self._losses_path) else [])

    def note_loss(self, loss: float) -> None:
        self.losses.append(float(loss))

    def save(self, step: int, state, loss: Optional[float] = None,
             force: bool = False) -> None:
        if loss is not None:
            self.losses.append(float(loss))
        saved = self._mgr.save(step, args=ocp.args.StandardSave(state),
                               force=force)
        if saved:
            np.save(self._losses_path, np.asarray(self.losses))

    def restore(self, abstract_state, step: Optional[int] = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(abstract_state))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()


def export_inference_weights(params, path: str) -> None:
    """Flatten Flax params to a torch-free .npz for inference distribution."""
    import jax

    flat = {}

    def visit(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                visit(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree)

    visit("", jax.device_get(params))
    np.savez(path, **flat)


def load_inference_weights(path: str):
    """Inverse of export_inference_weights -> nested params dict."""
    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            parts = key.split("/")
            node = out
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return out
