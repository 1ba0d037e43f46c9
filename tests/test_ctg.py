"""CTG++ stack tests: pipeline shapes, diffusion loss/sampling, RTG model."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import load_config, preset
from ctrl_sim_tpu.data import synthetic_scenario, stack_scenarios
from ctrl_sim_tpu.data.ctg_pipeline import build_ctg_batch
from ctrl_sim_tpu.data.datagen import generate_offline_data
from ctrl_sim_tpu.data.scenario import Scenario
from ctrl_sim_tpu.models.ctg.diffusion import cosine_beta_schedule
from ctrl_sim_tpu.models.ctg_plus_plus import CTGPlusPlus

SMALL = {
    "model.hidden_dim": 16,
    "model.dim_feedforward": 32,
    "model.num_heads": 2,
    "model.num_transformer_encoder_layers": 1,
    "model.dropout": 0.0,
    "model.compute_dtype": "float32",
    "model.n_diffusion_steps": 8,
    "model.n_eval_diffusion_step": 4,
    "model.use_rtg": True,
    "waymo.train_context_length": 12,
    "waymo.input_horizon": 4,
    "waymo.max_num_agents": 4,
    "waymo.max_num_road_polylines": 6,
    "waymo.max_num_road_pts_per_polyline": 8,
    "sim.steps": 16,
    "sim.max_agents": 4,
}


def _ctg_cfg():
    cfg = preset("ctg_plus_plus")
    from ctrl_sim_tpu.config import _set_dotted

    for k, v in SMALL.items():
        cfg = _set_dotted(cfg, k, v)
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = _ctg_cfg()
    scenes = [
        synthetic_scenario(cfg, seed=s, num_agents=3, arena_half=60.0, num_lanes=2)
        for s in range(2)
    ]
    sb = stack_scenarios(scenes, cfg)
    sb = Scenario(
        **{
            k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
            for k, v in dataclasses.asdict(sb).items()
        }
    )
    offline = generate_offline_data(cfg, sb)
    batch = build_ctg_batch(cfg, jax.random.PRNGKey(0), sb, offline)
    return cfg, batch


def test_cosine_schedule_matches_reference():
    # numpy golden from diffusion_helpers.py:80-91
    n = 16
    steps = n + 1
    x = np.linspace(0, steps, steps)
    ac = np.cos(((x / steps) + 0.008) / 1.008 * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    want = np.clip(1 - ac[1:] / ac[:-1], 0, 0.999)
    got = cosine_beta_schedule(n)
    np.testing.assert_allclose(got, want, atol=1e-6)


class TestCtgPipeline:
    def test_shapes(self, setup):
        cfg, b = setup
        wc = cfg.waymo
        K, T_in = wc.max_num_agents, wc.input_horizon
        T_out = wc.train_context_length - T_in
        assert b["agent_past_states"].shape == (2, K, T_in, 8)
        assert b["agent_future_states"].shape == (2, K, T_out, 6)
        assert b["agent_past_actions"].shape == (2, K, T_in, 2)
        assert b["agent_future_actions"].shape == (2, K, T_out, 2)
        assert b["past_relative_encodings"].shape == (2, K, K, T_in, 7)
        assert b["future_relative_encodings"].shape == (2, K, K, T_out, 7)
        assert b["road_points"].shape[:2] == (2, K)
        assert b["rtgs"].shape == (2, K, T_in, 3)

    def test_actions_normalized(self, setup):
        _, b = setup
        a = np.asarray(b["agent_past_actions"])
        assert a.min() >= -1.0 - 1e-6 and a.max() <= 1.0 + 1e-6

    def test_local_frame_present_at_origin(self, setup):
        # each existing agent's own present state sits at its frame origin
        _, b = setup
        past = np.asarray(b["agent_past_states"])
        exist = past[:, :, -1, -1] > 0
        present_pos = past[:, :, -1, :2]
        assert np.all(np.linalg.norm(present_pos[exist], axis=-1) < 1e-4)


class TestCtgModel:
    def test_loss_and_sample(self, setup):
        cfg, batch = setup
        model = CTGPlusPlus(cfg)
        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            batch,
            jax.random.PRNGKey(1),
            method=CTGPlusPlus.loss,
        )
        losses = model.apply(
            params, batch, jax.random.PRNGKey(2), method=CTGPlusPlus.loss,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        for name, v in losses._asdict().items():
            assert np.isfinite(float(v)), name

        samples = model.apply(params, batch, jax.random.PRNGKey(4))
        wc = cfg.waymo
        T_out = wc.train_context_length - wc.input_horizon
        assert samples.shape == (2, wc.max_num_agents, T_out, 7)
        assert np.isfinite(np.asarray(samples)).all()

        mse = model.apply(
            params, batch, jax.random.PRNGKey(5),
            method=CTGPlusPlus.validation_mse,
        )
        assert np.isfinite(float(mse["state_mse"]))
        assert np.isfinite(float(mse["action_mse"]))
