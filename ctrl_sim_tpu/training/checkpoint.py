"""Checkpointing with orbax: best/last semantics + auto-resume.

Replaces Lightning's ModelCheckpoint(save_last, best-by-val_loss) +
"resume from last.ckpt if present" (reference train.py:34-69). Config is
snapshotted next to the weights, which also removes the reference's
checkpoint hyperparameter-grafting hack (train.py:86-94).
"""

from __future__ import annotations

import json
import os
from typing import Any

import orbax.checkpoint as ocp

from ctrl_sim_tpu.config import Config


class CheckpointManager:
    def __init__(self, cfg: Config, directory: str):
        self.cfg = cfg
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=cfg.train.keep_last_n,
            best_fn=lambda metrics: -metrics.get("val_loss", float("inf")),
            create=True,
        )
        self.manager = ocp.CheckpointManager(self.directory, options=options)
        cfg_path = os.path.join(self.directory, "config.json")
        if not os.path.exists(cfg_path):
            with open(cfg_path, "w") as f:
                f.write(cfg.to_json())

    def save(self, step: int, state: Any, metrics: dict | None = None) -> None:
        self.manager.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics=metrics or {},
        )

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    @staticmethod
    def load_config(directory: str) -> dict:
        with open(os.path.join(directory, "config.json")) as f:
            return json.load(f)
