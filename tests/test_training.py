"""Trainer tests: loss decreases on a tiny overfit task; GSPMD-sharded step
runs on the 8-virtual-device CPU mesh; checkpoint round-trips."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import load_config
from ctrl_sim_tpu.data import synthetic_scenario, stack_scenarios
from ctrl_sim_tpu.data.datagen import generate_offline_data
from ctrl_sim_tpu.data.pipeline import build_train_batch
from ctrl_sim_tpu.data.scenario import Scenario
from ctrl_sim_tpu.parallel import make_mesh
from ctrl_sim_tpu.training import Trainer

TINY = {
    "model.hidden_dim": 32,
    "model.dim_feedforward": 64,
    "model.num_heads": 2,
    "model.num_decoder_layers": 1,
    "model.num_transformer_encoder_layers": 1,
    "model.dropout": 0.0,
    "model.goal_dropout": 0.0,
    "model.compute_dtype": "float32",
    "waymo.train_context_length": 4,
    "waymo.max_num_agents": 4,
    "waymo.max_num_road_polylines": 8,
    "waymo.max_num_road_pts_per_polyline": 10,
    "sim.steps": 10,
    "train.warmup_steps": 5,
    "train.max_steps": 200,
    "train.lr": 1e-3,
}


def _batch(cfg, num_envs, seed=0):
    scenes = [
        synthetic_scenario(cfg, seed=seed + s, num_agents=3, arena_half=60.0,
                           num_lanes=2, invalid_tail_agents=0)
        for s in range(num_envs)
    ]
    sb = stack_scenarios(scenes, cfg)
    sb = Scenario(**{k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                     for k, v in dataclasses.asdict(sb).items()})
    offline = generate_offline_data(cfg, sb)
    return build_train_batch(cfg, jax.random.PRNGKey(seed), sb, offline)


@pytest.fixture(scope="module")
def cfg():
    return load_config(TINY)


def test_loss_decreases_single_device(cfg):
    batch = _batch(cfg, 2)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = trainer.make_train_step()
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(30):
        state, losses = step(state, batch, rng)
        if first is None:
            first = float(losses.total)
    last = float(losses.total)
    assert np.isfinite(last)
    assert last < first * 0.9, (first, last)


def test_sharded_train_step_on_mesh(cfg):
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(data=8)
    batch = _batch(cfg, 8)
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    sharded = mesh.shard_batch(batch)
    step = trainer.make_train_step()
    state, losses = step(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses.total))
    # sharded batch leading axis spread over the data axis
    any_leaf = sharded["agent_states"]
    assert any_leaf.sharding.spec == jax.sharding.PartitionSpec("data")
    # params stay replicated
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_matches_unsharded(cfg):
    mesh = make_mesh(data=8)
    batch = _batch(cfg, 8)
    t1 = Trainer(cfg)
    t2 = Trainer(cfg, mesh=mesh)
    s1 = t1.init_state(jax.random.PRNGKey(0), batch)
    s2 = t2.init_state(jax.random.PRNGKey(0), batch)
    step1 = t1.make_train_step()
    step2 = t2.make_train_step()
    rng = jax.random.PRNGKey(1)
    s1, l1 = step1(s1, batch, rng)
    s2, l2 = step2(s2, mesh.shard_batch(batch), rng)
    np.testing.assert_allclose(float(l1.total), float(l2.total), rtol=2e-5)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-5)


def test_checkpoint_roundtrip(cfg, tmp_path):
    from ctrl_sim_tpu.training.checkpoint import CheckpointManager

    batch = _batch(cfg, 2)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = trainer.make_train_step()
    state, _ = step(state, batch, jax.random.PRNGKey(1))

    mgr = CheckpointManager(cfg, str(tmp_path / "ckpt"))
    mgr.save(int(state.step), state, metrics={"val_loss": 1.0})
    mgr.wait()
    assert mgr.latest_step() == 1

    template = trainer.init_state(jax.random.PRNGKey(7), batch)
    restored = mgr.restore(template)
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
