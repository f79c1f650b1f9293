"""Run logging: stdout + JSONL metrics, optional wandb.

Replaces the reference's wandb-everywhere logging (``main.py:78-101``,
``fused.py:405-418``) with a local-first JSONL metrics stream (one line per
log call: ``{"step": N, **metrics}``) and the same python-logging setup
(``utils.py:18-30``). wandb attaches automatically when the package is
importable and ``testing`` is off.
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Optional


def logger_setup(log_dir: str = "logs") -> None:
    os.makedirs(log_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s [%(levelname)-5.5s] %(message)s",
        handlers=[
            logging.FileHandler(os.path.join(log_dir, "logs.log")),
            logging.StreamHandler(sys.stdout),
        ],
        force=True,
    )


class RunLogger:
    def __init__(self, run_dir: str, config: Optional[dict] = None,
                 use_wandb: bool = False, project: str = "rmm_tpu",
                 run_id: Optional[str] = None, group: Optional[str] = None):
        os.makedirs(run_dir, exist_ok=True)
        self.run_dir = run_dir
        self.run_id = run_id or hex(int(time.time() * 1000))[2:]
        self._f = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(
                    project=project, config=config, id=run_id,
                    resume="must" if run_id else None, group=group)
            except Exception:
                self._wandb = None
        if config is not None:
            with open(os.path.join(run_dir, "config.json"), "w") as f:
                json.dump(config, f, default=str, indent=2)

    def log(self, metrics: dict, step: int) -> None:
        rec = {"step": step, "time": time.time(), **metrics}
        self._f.write(json.dumps(rec, default=float) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
