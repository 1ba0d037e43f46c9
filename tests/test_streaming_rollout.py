"""End-to-end streaming (KV-cached) rollout: smoke + GT-replay parity.

run_streaming is the bench's headline path; these tests pin down that

- it runs under jit on small shapes and produces finite outputs;
- with NO controlled agents it is pure ground-truth replay through the
  physics, so trajectories must match the exact-mode rollout bitwise (the
  policy decode affects only controlled agents' applied actions).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import _set_dotted, load_config, preset
from ctrl_sim_tpu.data import stack_scenarios, synthetic_scenario
from ctrl_sim_tpu.data.datagen import generate_offline_data
from ctrl_sim_tpu.data.pipeline import build_train_batch
from ctrl_sim_tpu.data.scenario import Scenario
from ctrl_sim_tpu.models.ctrl_sim import CtRLSim
from ctrl_sim_tpu.rollout.rollout import run_closed_loop
from ctrl_sim_tpu.rollout.streaming import run_streaming

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


@pytest.fixture(scope="module")
def setup():
    cfg = load_config()
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
    model = CtRLSim(cfg)
    offline = generate_offline_data(cfg, sbj)
    tb = build_train_batch(cfg, jax.random.PRNGKey(0), sbj, offline)
    params = model.init({"params": jax.random.PRNGKey(0)}, tb)
    return cfg, model, params, sb, sbj


def test_streaming_rollout_smoke(setup):
    cfg, model, params, sb, sbj = setup
    controlled = jnp.asarray(sb.moving) & jnp.asarray(sb.agent_valid)
    ro = jax.jit(
        lambda s, p, c, r: run_streaming(cfg, model, p, s, c, r, None)
    )(sbj, params, controlled, jax.random.PRNGKey(1))
    ro = jax.tree.map(np.asarray, ro)
    live = ro.position > -1e5
    assert np.isfinite(ro.position[live]).all()
    assert np.isfinite(ro.reward8).all()
    assert ro.position.shape[0] == cfg.sim.steps + 1


def test_streaming_gt_replay_matches_exact(setup):
    """With controlled_mask all-False both modes apply inverse-bicycle GT
    actions only; the env trajectories and rewards must agree exactly."""
    cfg, model, params, sb, sbj = setup
    controlled = jnp.zeros_like(jnp.asarray(sb.moving))
    ro_s = jax.jit(
        lambda s, p, c, r: run_streaming(cfg, model, p, s, c, r, None)
    )(sbj, params, controlled, jax.random.PRNGKey(1))
    ro_e = jax.jit(
        lambda s, p, c, r: run_closed_loop(cfg, model, p, s, c, r, None)
    )(sbj, params, controlled, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(ro_s.position), np.asarray(ro_e.position), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ro_s.heading), np.asarray(ro_e.heading), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ro_s.reward8), np.asarray(ro_e.reward8), atol=1e-5
    )


def test_streaming_int8_kv_cache_close_to_bf16(setup):
    """kv_cache_dtype=int8 (CPU dequantized path) must track the exact-cache
    rollout: identical GT-replay trajectories (policy logits unused), and a
    running smoke with controlled agents stays finite."""
    cfg, model, params, sb, sbj = setup
    from ctrl_sim_tpu.config import _set_dotted as sd

    cfg8 = sd(cfg, "model.kv_cache_dtype", "int8")
    controlled = jnp.zeros_like(jnp.asarray(sb.moving))
    ro8 = jax.jit(
        lambda s, p, c, r: run_streaming(cfg8, model, p, s, c, r, None)
    )(sbj, params, controlled, jax.random.PRNGKey(1))
    ro = jax.jit(
        lambda s, p, c, r: run_streaming(cfg, model, p, s, c, r, None)
    )(sbj, params, controlled, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(ro8.position), np.asarray(ro.position), atol=1e-5
    )

    controlled = jnp.asarray(sb.moving) & jnp.asarray(sb.agent_valid)
    ro8c = jax.jit(
        lambda s, p, c, r: run_streaming(cfg8, model, p, s, c, r, None)
    )(sbj, params, controlled, jax.random.PRNGKey(1))
    ro8c = jax.tree.map(np.asarray, ro8c)
    live = ro8c.position > -1e5
    assert np.isfinite(ro8c.position[live]).all()


@pytest.mark.parametrize("family", ["dt", "il", "trajeglish"])
def test_streaming_variant_rollout_runs(family):
    """DT (one fused rtg+state pass with real-time RTG decay), IL (K=2) and
    trajeglish (K=1 zero-action probe) streaming layouts run end-to-end."""
    cfg = preset(family)
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
    model = CtRLSim(cfg)
    offline = generate_offline_data(cfg, sbj)
    tb = build_train_batch(cfg, jax.random.PRNGKey(0), sbj, offline)
    if cfg.model.decision_transformer:
        tb = dict(tb)
        tb["rtgs"] = tb["rtgs"].astype(jnp.float32) / cfg.waymo.rtg_discretization
    params = model.init({"params": jax.random.PRNGKey(0)}, tb)
    controlled = jnp.asarray(sb.moving) & jnp.asarray(sb.agent_valid)
    ro = jax.jit(
        lambda s, p, c, r: run_streaming(cfg, model, p, s, c, r, None)
    )(sbj, params, controlled, jax.random.PRNGKey(1))
    ro = jax.tree.map(np.asarray, ro)
    live = ro.position > -1e5
    assert np.isfinite(ro.position[live]).all()
    assert np.isfinite(ro.reward8).all()


def test_streaming_rollout_rbg_key(setup):
    """The bench defaults to BENCH_RNG=rbg (hardware RngBitGenerator keys,
    +3.8% on TPU round 5); the rollout must accept an impl-typed key —
    same program, different random stream — and stay finite. threefry
    remains the default elsewhere for cross-backend reproducibility."""
    cfg, model, params, sb, sbj = setup
    controlled = jnp.asarray(sb.moving) & jnp.asarray(sb.agent_valid)
    ro = jax.jit(
        lambda s, p, c, r: run_streaming(cfg, model, p, s, c, r, None)
    )(sbj, params, controlled, jax.random.key(1, impl="rbg"))
    ro = jax.tree.map(np.asarray, ro)
    live = ro.position > -1e5
    assert np.isfinite(ro.position[live]).all()
    assert np.isfinite(ro.reward8).all()
