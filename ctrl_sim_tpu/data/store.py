"""Scenario store: preprocessing cache + train-batch sampling.

The reference's flow (README "Generating the Offline RL Dataset"):
raw Waymo JSON -> replay through physics (*_physics.json) -> preprocessed
pickles -> torch DataLoader with 6 worker processes per rank.

Here: scenario JSONs (either dialect) -> Scenario arrays -> batched
replay-through-physics on device (data/datagen.py) -> OfflineArrays kept
as host numpy (or an .npz cache on disk) -> per step, sample scenario
indices and build the whole model batch on device in one fused kernel
(data/pipeline.py). No worker processes; the "dataloader" is a gather.
"""

from __future__ import annotations

import dataclasses
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.data.datagen import OfflineArrays, generate_offline_data
from ctrl_sim_tpu.data.pipeline import build_train_batch
from ctrl_sim_tpu.data.scenario import Scenario, load_scenario_json, stack_scenarios


class ScenarioStore:
    """Holds a preprocessed scenario set and samples training batches."""

    def __init__(self, cfg: Config, scenario: Scenario, offline: OfflineArrays):
        self.cfg = cfg
        self.scenario = scenario  # stacked, host numpy
        self.offline = jax.tree.map(np.asarray, offline)
        self.num_scenes = scenario.traj_position.shape[0]

    # ------------------------------------------------------------------
    @classmethod
    def from_json_dir(
        cls, cfg: Config, directory: str, limit: int | None = None,
        replay_chunk: int = 64,
    ) -> "ScenarioStore":
        files = sorted(glob.glob(os.path.join(directory, "*.json")))
        if limit:
            files = files[:limit]
        scenes = [load_scenario_json(f, cfg) for f in files]
        return cls.from_scenes(cfg, scenes, replay_chunk)

    @classmethod
    def from_scenes(
        cls, cfg: Config, scenes: list[Scenario], replay_chunk: int = 64
    ) -> "ScenarioStore":
        batch = stack_scenarios(scenes, cfg)
        replay = jax.jit(lambda sb: generate_offline_data(cfg, sb))
        chunks = []
        n = batch.traj_position.shape[0]
        for i in range(0, n, replay_chunk):
            sl = _slice_scenario(batch, i, min(i + replay_chunk, n))
            chunks.append(jax.tree.map(np.asarray, replay(_to_device(sl))))
        offline = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *chunks)
        return cls(cfg, batch, offline)

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez_compressed(
            os.path.join(path, "scenarios.npz"),
            **{
                k: v
                for k, v in dataclasses.asdict(self.scenario).items()
                if isinstance(v, np.ndarray)
            },
        )
        np.savez_compressed(
            os.path.join(path, "offline.npz"), **self.offline._asdict()
        )

    @classmethod
    def load(cls, cfg: Config, path: str) -> "ScenarioStore":
        sc = dict(np.load(os.path.join(path, "scenarios.npz")))
        sc["rewards"] = sc.get("rewards")
        sc["actions"] = sc.get("actions")
        scenario = Scenario(**sc, name="store")
        off = np.load(os.path.join(path, "offline.npz"))
        offline = OfflineArrays(**{k: off[k] for k in off.files})
        return cls(cfg, scenario, offline)

    # ------------------------------------------------------------------
    def sample_batch(self, key, batch_size: int, family: str = "ctrl_sim") -> dict:
        """Sample scenario indices (with replacement) and build a training
        batch on device. ``family='ctg_plus_plus'`` builds the CTG++
        diffusion batch (past/future split, local frames, relative
        encodings) instead of the token batch."""
        k_idx, k_batch = jax.random.split(jnp.asarray(key))
        idx = jax.random.randint(k_idx, (batch_size,), 0, self.num_scenes)
        idx = np.asarray(idx)
        scen = _to_device(_gather_scenario(self.scenario, idx))
        off = jax.tree.map(lambda x: jnp.asarray(x[idx]), self.offline)
        if family == "ctg_plus_plus":
            from ctrl_sim_tpu.data.ctg_pipeline import build_ctg_batch

            return build_ctg_batch(self.cfg, k_batch, scen, off)
        return build_train_batch(self.cfg, k_batch, scen, off)


def _slice_scenario(batch: Scenario, lo: int, hi: int) -> Scenario:
    return Scenario(
        **{
            k: (v[lo:hi] if isinstance(v, (np.ndarray,)) else v)
            for k, v in dataclasses.asdict(batch).items()
        }
    )


def _gather_scenario(batch: Scenario, idx: np.ndarray) -> Scenario:
    return Scenario(
        **{
            k: (v[idx] if isinstance(v, np.ndarray) else v)
            for k, v in dataclasses.asdict(batch).items()
        }
    )


def _to_device(s: Scenario) -> Scenario:
    # clear the (static-metadata) name so differently-named scenario batches
    # hit the same jit cache entry
    d = {
        k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
        for k, v in dataclasses.asdict(s).items()
    }
    d["name"] = ""
    return Scenario(**d)
