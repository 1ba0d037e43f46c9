"""CTG++ closed-loop rollout smoke test (small config)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import _set_dotted, preset
from ctrl_sim_tpu.data import synthetic_scenario, stack_scenarios
from ctrl_sim_tpu.data.ctg_pipeline import build_ctg_batch
from ctrl_sim_tpu.data.datagen import generate_offline_data
from ctrl_sim_tpu.data.scenario import Scenario
from ctrl_sim_tpu.models.ctg_plus_plus import CTGPlusPlus
from ctrl_sim_tpu.rollout.ctg_rollout import run_ctg_closed_loop

SMALL = {
    "model.hidden_dim": 16,
    "model.dim_feedforward": 32,
    "model.num_heads": 2,
    "model.num_transformer_encoder_layers": 1,
    "model.dropout": 0.0,
    "model.compute_dtype": "float32",
    "model.n_diffusion_steps": 4,
    "model.n_eval_diffusion_step": 2,
    "model.use_rtg": False,
    "waymo.train_context_length": 10,
    "waymo.input_horizon": 4,
    "waymo.max_num_agents": 3,
    "waymo.max_num_road_polylines": 6,
    "waymo.max_num_road_pts_per_polyline": 8,
    "sim.steps": 12,
    "sim.history_steps": 4,
    "sim.max_agents": 3,
}


@pytest.mark.slow  # diffusion closed loop ~100 s
def test_ctg_rollout_runs():
    cfg = preset("ctg_plus_plus")
    for k, v in SMALL.items():
        cfg = _set_dotted(cfg, k, v)
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

    model = CTGPlusPlus(cfg)
    offline = generate_offline_data(cfg, sbj)
    batch = build_ctg_batch(cfg, jax.random.PRNGKey(0), sbj, offline)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1),
        method=CTGPlusPlus.loss,
    )
    controlled = jnp.asarray(sb.moving) & jnp.asarray(sb.agent_valid)
    ro = jax.jit(
        lambda s, p, c, r: run_ctg_closed_loop(cfg, model, p, s, c, r)
    )(sbj, params, controlled, jax.random.PRNGKey(2))
    ro = jax.tree.map(np.asarray, ro)
    live = ro.position > -1e5
    assert np.isfinite(ro.position[live]).all()
    assert np.isfinite(ro.reward8).all()
    assert ro.acceleration.shape[0] == cfg.sim.steps
