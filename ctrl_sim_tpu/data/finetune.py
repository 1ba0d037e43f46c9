"""Adversarial finetuning data: CAT scenarios mixed with real replay.

Port of RLWaymoDatasetCtRLSimFineTuning + RLWaymoDataModuleFineTuning: a
finetuning batch mixes adversarial (CAT-attacked) scenarios with real
scenarios at ``replay_ratio`` (0.5). The reference re-samples which real
scenes participate each epoch (datamodules re-sample indices,
dataset_ctrl_sim_finetuning.py:40-43); with on-device with-replacement
sampling every batch draws a fresh real subset, which subsumes the per-epoch
shuffle.

CAT samples carry a focal (adversary) agent index: the sample is centered on
it (``center_on_focal_agent``) and, when ``supervise_focal_agent``, the loss
mask keeps only the focal agent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.data.pipeline import build_train_sample, compute_rtgs, goals_from_scenario
from ctrl_sim_tpu.data.store import ScenarioStore, _gather_scenario, _to_device

Array = jax.Array


class FinetuningStore:
    """Samples mixed real/adversarial batches."""

    def __init__(
        self,
        cfg: Config,
        real: ScenarioStore,
        simulated: ScenarioStore,
        focal_agent_idx: np.ndarray,  # [num_simulated] adversary index per scene
    ):
        self.cfg = cfg
        self.real = real
        self.simulated = simulated
        self.focal_agent_idx = np.asarray(focal_agent_idx, np.int32)

    def sample_batch(self, key, batch_size: int) -> dict:
        cfg = self.cfg
        k_split, k_real, k_sim, k_batch = jax.random.split(jnp.asarray(key), 4)
        num_real = int(round(batch_size * cfg.waymo.replay_ratio))
        num_sim = batch_size - num_real

        idx_real = np.asarray(
            jax.random.randint(k_real, (num_real,), 0, self.real.num_scenes)
        )
        idx_sim = np.asarray(
            jax.random.randint(k_sim, (num_sim,), 0, self.simulated.num_scenes)
        )

        # concatenate scenario slices + offline arrays host-side
        scen = _concat_scenarios(
            _gather_scenario(self.real.scenario, idx_real),
            _gather_scenario(self.simulated.scenario, idx_sim),
        )
        off = jax.tree.map(
            lambda a, b: np.concatenate([a[idx_real], b[idx_sim]], axis=0),
            self.real.offline,
            self.simulated.offline,
        )
        focal = np.concatenate(
            [np.full(num_real, -1, np.int32), self.focal_agent_idx[idx_sim]]
        )
        supervise = np.concatenate(
            [
                np.zeros(num_real, bool),
                np.full(num_sim, self.cfg.waymo.supervise_focal_agent, bool),
            ]
        )

        scen_d = _to_device(scen)
        rtgs = compute_rtgs(cfg, jax.tree.map(jnp.asarray, off))
        goals = goals_from_scenario(scen_d)
        keys = jax.random.split(k_batch, batch_size)
        batch = jax.vmap(
            lambda k, s, a, r, g, av, rp, rt, rv, f, sf: build_train_sample(
                cfg, k, s, a, r, g, av, rp, rt, rv, f, sf
            )
        )(
            keys,
            jnp.asarray(off.states),
            jnp.asarray(off.actions),
            rtgs,
            goals,
            jnp.asarray(scen.agent_valid),
            jnp.asarray(scen.road_points),
            jnp.asarray(scen.road_types),
            jnp.asarray(scen.road_valid),
            jnp.asarray(focal),
            jnp.asarray(supervise),
        )
        type_onehot = jax.nn.one_hot(
            jnp.asarray(scen.agent_type), cfg.waymo.num_agent_types
        )
        gathered = jax.vmap(jnp.take, in_axes=(0, 0, None))(
            type_onehot, batch["gather_idx"], 0
        )
        batch["agent_types"] = jnp.where(
            batch["slot_valid"][..., None], gathered, -1.0
        )
        return batch


def _concat_scenarios(a, b):
    import dataclasses

    from ctrl_sim_tpu.data.scenario import Scenario

    da = dataclasses.asdict(a)
    db = dataclasses.asdict(b)
    out = {}
    for k in da:
        if isinstance(da[k], np.ndarray) and isinstance(db[k], np.ndarray):
            out[k] = np.concatenate([da[k], db[k]], axis=0)
        elif k == "name":
            out[k] = ""
        else:
            out[k] = da[k]
    return Scenario(**out)
