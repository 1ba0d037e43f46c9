"""Fused 2-pass action deferral vs faithful sequential 3-pass decode
(eval.streaming_passes).

The only semantic difference is the t-1 action tokens' receptive field:
the fused pass writes them AFTER this step's states overwrote the
t-window ring slot (window-1 steps of history), the sequential pass
before (full window). Therefore:

- while the episode fits the window (no ring wrap), the two modes are
  BIT-IDENTICAL — a sharp machinery equivalence;
- with wrapping, both still replay GT bitwise (policy outputs unused);
- with wrapping + controlled agents, both run finite (the metric-level
  A/B lives in the committed artifacts).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import _set_dotted, load_config
from ctrl_sim_tpu.data import stack_scenarios, synthetic_scenario
from ctrl_sim_tpu.data.datagen import generate_offline_data
from ctrl_sim_tpu.data.pipeline import build_train_batch
from ctrl_sim_tpu.data.scenario import Scenario
from ctrl_sim_tpu.models.ctrl_sim import CtRLSim
from ctrl_sim_tpu.rollout.streaming import run_streaming

SMALL = {
    "model.hidden_dim": 32,
    "model.dim_feedforward": 64,
    "model.num_heads": 2,
    "model.num_decoder_layers": 1,
    "model.num_transformer_encoder_layers": 1,
    "model.compute_dtype": "float32",
    "waymo.max_num_agents": 4,
    "waymo.max_num_road_polylines": 8,
    "waymo.max_num_road_pts_per_polyline": 10,
    "sim.steps": 10,
    "sim.history_steps": 3,
    "sim.max_agents": 4,
}


def _setup(window: int):
    cfg = load_config()
    for k, v in {**SMALL, "waymo.train_context_length": window}.items():
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
    model = CtRLSim(cfg)
    offline = generate_offline_data(cfg, sbj)
    tb = build_train_batch(cfg, jax.random.PRNGKey(0), sbj, offline)
    params = model.init({"params": jax.random.PRNGKey(0)}, tb)
    return cfg, model, params, sb, sbj


def _run(cfg, model, params, sbj, controlled, passes):
    c = _set_dotted(cfg, "eval.streaming_passes", passes)
    return jax.jit(
        lambda s, p, cm, r: run_streaming(c, model, p, s, cm, r, None)
    )(sbj, params, controlled, jax.random.PRNGKey(1))


def test_identical_while_window_covers_episode():
    """window=12 > steps=10: no ring wrap, so the deferral's receptive-field
    difference vanishes — the two modes must agree bitwise, controlled
    agents included."""
    cfg, model, params, sb, sbj = _setup(window=12)
    controlled = jnp.asarray(sb.moving) & jnp.asarray(sb.agent_valid)
    ro2 = _run(cfg, model, params, sbj, controlled, 2)
    ro3 = _run(cfg, model, params, sbj, controlled, 3)
    np.testing.assert_array_equal(
        np.asarray(ro2.position), np.asarray(ro3.position)
    )
    np.testing.assert_array_equal(
        np.asarray(ro2.rtgs), np.asarray(ro3.rtgs)
    )


def test_gt_replay_identical_with_wrapping():
    cfg, model, params, sb, sbj = _setup(window=4)
    controlled = jnp.zeros_like(jnp.asarray(sb.moving))
    ro2 = _run(cfg, model, params, sbj, controlled, 2)
    ro3 = _run(cfg, model, params, sbj, controlled, 3)
    np.testing.assert_allclose(
        np.asarray(ro2.position), np.asarray(ro3.position), atol=1e-6
    )


def test_wrapped_controlled_rollout_finite():
    cfg, model, params, sb, sbj = _setup(window=4)
    controlled = jnp.asarray(sb.moving) & jnp.asarray(sb.agent_valid)
    ro3 = _run(cfg, model, params, sbj, controlled, 3)
    ro3 = jax.tree.map(np.asarray, ro3)
    live = ro3.position > -1e5
    assert np.isfinite(ro3.position[live]).all()
    assert np.isfinite(ro3.reward8).all()
