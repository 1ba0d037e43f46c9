"""Multi-device rollout: the env/lane axis shards over the mesh `data` axis
under plain jit+GSPMD — the TPU analog of the reference's per-process eval
partitioning (SURVEY.md §2.3)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ctrl_sim_tpu.config import load_config
from ctrl_sim_tpu.data import synthetic_scenario, stack_scenarios
from ctrl_sim_tpu.data.datagen import generate_offline_data
from ctrl_sim_tpu.data.pipeline import build_train_batch
from ctrl_sim_tpu.data.scenario import Scenario
from ctrl_sim_tpu.models.ctrl_sim import CtRLSim
from ctrl_sim_tpu.parallel import make_mesh
from ctrl_sim_tpu.rollout import run_closed_loop

CFG = load_config(
    {
        "model.hidden_dim": 32,
        "model.dim_feedforward": 64,
        "model.num_heads": 2,
        "model.num_decoder_layers": 1,
        "model.num_transformer_encoder_layers": 1,
        "model.compute_dtype": "float32",
        "waymo.train_context_length": 4,
        "waymo.max_num_agents": 4,
        "waymo.max_num_road_polylines": 8,
        "waymo.max_num_road_pts_per_polyline": 10,
        "sim.steps": 8,
        "sim.history_steps": 3,
        "sim.max_agents": 4,
    }
)


@pytest.mark.slow  # 8-device rollout ~87 s
def test_rollout_shards_over_env_axis():
    cfg = CFG
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=8)
    scenes = [
        synthetic_scenario(cfg, seed=s, num_agents=3, arena_half=60.0,
                           num_lanes=2, invalid_tail_agents=0)
        for s in range(8)
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

    controlled = jnp.asarray(sb.moving) & jnp.asarray(sb.agent_valid)

    # shard every scenario leaf + controlled mask over `data`
    data_sharding = NamedSharding(mesh.mesh, P("data"))
    sb_sharded = jax.tree.map(
        lambda x: jax.device_put(x, data_sharding), sbj
    )
    controlled_sharded = jax.device_put(controlled, data_sharding)
    params_repl = jax.device_put(params, NamedSharding(mesh.mesh, P()))

    rollout = jax.jit(
        lambda s, p, c, r: run_closed_loop(cfg, model, p, s, c, r, None)
    )
    out = rollout(sb_sharded, params_repl, controlled_sharded, jax.random.PRNGKey(1))
    out = jax.block_until_ready(out)
    alive = np.asarray(out.existence) > 0  # [T+1, E, A]
    assert np.isfinite(np.asarray(out.position)[alive]).all()
    # per-step streams keep the env axis sharded
    assert out.position.shape[1] == 8

    # numerical equality vs unsharded execution
    out2 = rollout(sbj, params, controlled, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(out.position), np.asarray(out2.position), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.reward8), np.asarray(out2.reward8), atol=2e-3
    )
