"""Experiment logging: JSONL metrics sink + optional wandb mirror.

The reference gates a WandbLogger on ``train.track`` (train.py:50-60) and
logs per-step losses with ``sync_dist`` plus per-layer gradient 2-norms
(models/ctrl_sim.py:231-238, ``on_before_optimizer_step`` -> ``grad_norm``).
Here the durable sink is a local ``metrics.jsonl`` (one JSON object per
logged step — trivially greppable/plottable, survives any cluster), and
wandb is mirrored to when the package is importable and ``train.track`` is
set; it is never a hard dependency.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping

import jax
import jax.numpy as jnp


class MetricsLogger:
    """Append-only JSONL metrics sink with an optional wandb mirror."""

    def __init__(self, save_dir: str, track: bool = False, config: Any = None):
        os.makedirs(save_dir, exist_ok=True)
        self.path = os.path.join(save_dir, "metrics.jsonl")
        self._fh = open(self.path, "a", buffering=1)
        self._wandb = None
        if track:
            try:
                import wandb  # noqa: F401  — optional, absent in this image

                self._wandb = wandb
                self._wandb.init(
                    project="ctrl-sim-tpu",
                    config=None if config is None else _config_dict(config),
                )
            except Exception as e:  # pragma: no cover - wandb not installed
                print(f"[log] wandb unavailable ({e}); JSONL sink only")

    def log(self, step: int, metrics: Mapping[str, float]) -> None:
        row = {"step": int(step), "ts": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        self._fh.write(json.dumps(row) + "\n")
        if self._wandb is not None:  # pragma: no cover
            self._wandb.log(dict(metrics), step=int(step))

    def close(self) -> None:
        self._fh.close()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.finish()


def _config_dict(cfg: Any) -> dict:
    import dataclasses

    return dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg) else dict(cfg)


def grad_norms(grads: Any) -> dict:
    """Per-parameter gradient 2-norms + the global norm, as a flat dict of
    scalars (the reference's ``grad_2.0_norm/<name>`` payload,
    models/ctrl_sim.py:231-238). Call inside jit; keys are static."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    out = {}
    sq = jnp.zeros((), jnp.float32)
    for path, leaf in flat:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        n2 = jnp.sum(jnp.square(leaf.astype(jnp.float32)))
        sq = sq + n2
        out[f"grad_2.0_norm/{name}"] = jnp.sqrt(n2)
    out["grad_2.0_norm_total"] = jnp.sqrt(sq)
    return out
