"""Optional experiment logging (wandb if installed, JSONL always).

The reference logs training to wandb (training.py:36-88) and carries wandb
fields in the benchmark configs.  wandb is not a baked dependency here, so
the logger degrades gracefully: metrics always append to a local JSONL file;
wandb is used only when importable AND a project is named.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricLogger:
    def __init__(self, log_dir: str, run_name: str = "run",
                 wandb_project: Optional[str] = None, config: dict | None = None):
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, f"{run_name}.metrics.jsonl")
        self._f = open(self._path, "a")
        self._wandb = None
        if wandb_project:
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(project=wandb_project, name=run_name,
                                         config=config or {})
            except Exception as e:  # wandb missing or offline
                print(f"[logging] wandb disabled: {e}")

    def log(self, step: int, **metrics) -> None:
        rec = {"step": step, "time": time.time(), **metrics}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
