"""Model forward/loss tests across the family variants, on a small config,
fed by the real data pipeline (synthetic scenes -> offline replay -> batch)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import load_config, preset
from ctrl_sim_tpu.data import synthetic_scenario, stack_scenarios
from ctrl_sim_tpu.data.datagen import generate_offline_data
from ctrl_sim_tpu.data.pipeline import build_train_batch
from ctrl_sim_tpu.data.scenario import Scenario
from ctrl_sim_tpu.models.ctrl_sim import CtRLSim, compute_loss

SMALL = {
    "model.hidden_dim": 32,
    "model.dim_feedforward": 64,
    "model.num_heads": 2,
    "model.num_decoder_layers": 2,
    "model.num_transformer_encoder_layers": 1,
    "model.compute_dtype": "float32",
    "waymo.train_context_length": 8,
    "waymo.max_num_agents": 6,
    "waymo.max_num_road_polylines": 16,
    "waymo.max_num_road_pts_per_polyline": 20,
    "sim.steps": 20,
}


def _to_device(s):
    return Scenario(
        **{
            k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
            for k, v in dataclasses.asdict(s).items()
        }
    )


def _make_batch(cfg, num_envs=2):
    scenes = [
        synthetic_scenario(cfg, seed=s, num_agents=4, arena_half=80.0, num_lanes=2)
        for s in range(num_envs)
    ]
    batch = _to_device(stack_scenarios(scenes, cfg))
    offline = generate_offline_data(cfg, batch)
    return build_train_batch(cfg, jax.random.PRNGKey(0), batch, offline)


@pytest.fixture(scope="module")
def base_cfg():
    return load_config(SMALL)


@pytest.fixture(scope="module")
def train_batch(base_cfg):
    return _make_batch(base_cfg)


class TestPipeline:
    def test_batch_shapes(self, base_cfg, train_batch):
        wc = base_cfg.waymo
        b = train_batch
        assert b["agent_states"].shape == (2, wc.max_num_agents, wc.train_context_length, 8)
        assert b["actions"].shape == (2, wc.max_num_agents, wc.train_context_length)
        assert b["rtgs"].shape == (2, wc.max_num_agents, wc.train_context_length, 3)
        assert b["road_points"].shape[1] == wc.max_num_road_polylines
        assert b["agent_types"].shape == (2, wc.max_num_agents, wc.num_agent_types)

    def test_discretization_ranges(self, base_cfg, train_batch):
        wc = base_cfg.waymo
        a = np.asarray(train_batch["actions"])
        assert a.min() >= 0 and a.max() < wc.action_dim
        r = np.asarray(train_batch["rtgs"])
        assert r.min() >= 0 and r.max() < wc.rtg_discretization

    def test_origin_agent_normalized(self, base_cfg, train_batch):
        # origin agent at window start sits at the origin; the stored heading
        # is -pi/2 — the reference's angle_sub(h, -rot) stores the *negated*
        # rotated heading (dataset.py:403: angle_sub returns target - current),
        # while the velocity vector is rotated to point along +y. Both train
        # and eval share this convention, so we replicate it exactly.
        for e in range(2):
            oi = int(train_batch["origin_idx"][e])
            s0 = np.asarray(train_batch["agent_states"])[e, oi, 0]
            assert np.linalg.norm(s0[:2]) < 1e-3
            assert abs(s0[4] + np.pi / 2) < 1e-3
            # velocity rotated to +y for a forward-moving origin agent
            if abs(s0[3]) > 0.2:
                assert s0[3] > 0


class TestModelForward:
    def test_forward_and_loss(self, base_cfg, train_batch):
        model = CtRLSim(base_cfg)
        params = model.init(
            {"params": jax.random.PRNGKey(0)}, train_batch, deterministic=True
        )
        preds = model.apply(params, train_batch, deterministic=True)
        wc = base_cfg.waymo
        assert preds.action_preds.shape == (
            2, wc.max_num_agents, wc.train_context_length, wc.action_dim)
        assert preds.rtg_preds.shape == (
            2, wc.max_num_agents, wc.train_context_length, wc.rtg_discretization * 3)
        assert preds.state_preds.shape == (
            2, wc.max_num_agents, wc.train_context_length, wc.train_context_length * 2)
        losses = compute_loss(base_cfg, train_batch, preds)
        for name, v in losses._asdict().items():
            assert np.isfinite(float(v)), name
        # untrained CE should be near log(num_classes)
        assert abs(float(losses.loss_actions) - np.log(wc.action_dim)) < 1.0
        assert abs(float(losses.loss_rtg_goal) - np.log(wc.rtg_discretization)) < 1.0

    def test_train_mode_with_dropout(self, base_cfg, train_batch):
        model = CtRLSim(base_cfg)
        params = model.init({"params": jax.random.PRNGKey(0)}, train_batch)
        preds = model.apply(
            params,
            train_batch,
            deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert np.isfinite(np.asarray(preds.action_preds, dtype=np.float32)).all()

    @pytest.mark.parametrize("family", ["dt", "il", "trajeglish"])
    def test_variants(self, family, train_batch):
        cfg = preset(family)
        for k, v in SMALL.items():
            cfg = cfg.replace() if False else cfg
        from ctrl_sim_tpu.config import load_config as _lc

        # apply the small dims on top of the family preset
        import dataclasses as _dc

        from ctrl_sim_tpu.config import _set_dotted

        for k, v in SMALL.items():
            cfg = _set_dotted(cfg, k, v)
        model = CtRLSim(cfg)
        batch = dict(train_batch)
        if family == "dt":
            batch["rtgs"] = batch["rtgs"].astype(jnp.float32) / cfg.waymo.rtg_discretization
        params = model.init({"params": jax.random.PRNGKey(0)}, batch)
        preds = model.apply(params, batch, deterministic=True)
        assert preds.action_preds.shape[-1] == cfg.waymo.action_dim
        assert preds.rtg_preds is None
        losses = compute_loss(cfg, batch, preds)
        assert np.isfinite(float(losses.total))


class TestLossMasking:
    def test_nonexistent_agents_do_not_contribute(self, base_cfg, train_batch):
        model = CtRLSim(base_cfg)
        params = model.init({"params": jax.random.PRNGKey(0)}, train_batch)
        preds = model.apply(params, train_batch, deterministic=True)
        base = compute_loss(base_cfg, train_batch, preds)

        # corrupt targets of non-existent slots: loss must not change
        b2 = dict(train_batch)
        ex = train_batch["agent_states"][..., -1] > 0
        b2["actions"] = jnp.where(ex, train_batch["actions"], 7.0)
        moving = train_batch["moving_agent_mask"] > 0
        b2["actions"] = jnp.where(
            moving[:, :, None], b2["actions"], 3.0
        )
        l2 = compute_loss(base_cfg, b2, preds)
        np.testing.assert_allclose(
            float(base.loss_actions), float(l2.loss_actions), rtol=1e-6
        )
