"""Closed-loop rollout across policy variants: ctrl_sim (tilted RTG),
DT (real-time decayed RTGs), IL / trajeglish (no RTGs)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import _set_dotted, preset
from ctrl_sim_tpu.data import synthetic_scenario, stack_scenarios
from ctrl_sim_tpu.data.datagen import generate_offline_data
from ctrl_sim_tpu.data.pipeline import build_train_batch
from ctrl_sim_tpu.data.scenario import Scenario
from ctrl_sim_tpu.models.ctrl_sim import CtRLSim
from ctrl_sim_tpu.rollout import run_closed_loop

SMALL = {
    "model.hidden_dim": 32,
    "model.dim_feedforward": 64,
    "model.num_heads": 2,
    "model.num_decoder_layers": 1,
    "model.num_transformer_encoder_layers": 1,
    "model.compute_dtype": "float32",
    "waymo.train_context_length": 5,
    "waymo.max_num_agents": 4,
    "waymo.max_num_road_polylines": 8,
    "waymo.max_num_road_pts_per_polyline": 10,
    "sim.steps": 10,
    "sim.history_steps": 3,
    "sim.max_agents": 4,
}


def _cfg(family):
    cfg = preset(family)
    for k, v in SMALL.items():
        cfg = _set_dotted(cfg, k, v)
    return cfg


def _run(cfg):
    scenes = [
        synthetic_scenario(cfg, seed=s, num_agents=3, arena_half=60.0,
                           num_lanes=2, invalid_tail_agents=0)
        for s in range(2)
    ]
    sb = stack_scenarios(scenes, cfg)
    d = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in dataclasses.asdict(sb).items()}
    d["name"] = ""
    sbj = Scenario(**d)
    model = CtRLSim(cfg)
    offline = generate_offline_data(cfg, sbj)
    tb = build_train_batch(cfg, jax.random.PRNGKey(0), sbj, offline)
    if cfg.model.decision_transformer:
        tb = dict(tb)
        tb["rtgs"] = tb["rtgs"].astype(jnp.float32) / cfg.waymo.rtg_discretization
    params = model.init({"params": jax.random.PRNGKey(0)}, tb)
    controlled = jnp.asarray(sb.moving) & jnp.asarray(sb.agent_valid)
    ro = jax.jit(
        lambda s, p, c, r: run_closed_loop(cfg, model, p, s, c, r, None)
    )(sbj, params, controlled, jax.random.PRNGKey(1))
    return jax.tree.map(np.asarray, ro)


@pytest.mark.parametrize("family", ["dt", "il", "trajeglish"])
def test_variant_rollout_runs(family):
    cfg = _cfg(family)
    ro = _run(cfg)
    live = ro.position > -1e5
    assert np.isfinite(ro.position[live]).all()
    assert np.isfinite(ro.reward8).all()
    if family == "dt":
        # real-time RTGs decay monotonically-ish from the (10, 90, 90) init:
        # value at step 1 differs from init for existing agents
        rtg_stream = ro.rtgs  # [T, E, A, 3] — zeros for DT (no sampling)
        assert rtg_stream.shape[-1] == 3
