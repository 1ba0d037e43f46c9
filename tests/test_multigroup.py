"""Multi-focal-group rollout: scenes with more agents than the model crop.

Pins:
- host-side group construction against a literal port of the reference's
  greedy while-loop (autoregressive_policy.py:88-137) on a hand-built scene
- G-padding invariance: adding empty group slots changes nothing, bitwise
- >crop-size scene runs end-to-end (exact + streaming), uncontrolled agents
  log-replay to GT parity
- scatter_by_rank dedup semantics (lowest rank wins, covered mask)
"""

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
from ctrl_sim_tpu.models.ctrl_sim import CtRLSim
from ctrl_sim_tpu.rollout.groups import (
    build_focal_groups,
    pad_groups,
    scatter_by_rank,
)
from ctrl_sim_tpu.rollout.rollout import run_closed_loop
from ctrl_sim_tpu.rollout.streaming import run_streaming

pytestmark = pytest.mark.slow  # multi-group rollouts: ~3 min incl. fixture

SMALL = {
    "model.hidden_dim": 32,
    "model.dim_feedforward": 64,
    "model.num_heads": 2,
    "model.num_decoder_layers": 1,
    "model.num_transformer_encoder_layers": 1,
    "model.compute_dtype": "float32",
    "waymo.train_context_length": 6,
    "waymo.max_num_agents": 4,  # model crop << scene size
    "waymo.max_num_road_polylines": 8,
    "waymo.max_num_road_pts_per_polyline": 10,
    "sim.steps": 14,
    "sim.history_steps": 4,
    "sim.max_agents": 10,  # env holds the full scene
    "eval.history_steps": 4,
}


def _jnp_scenario(sb):
    d = {
        k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
        for k, v in dataclasses.asdict(sb).items()
    }
    return Scenario(**d)


@pytest.fixture(scope="module")
def setup():
    cfg = load_config(SMALL)
    # two spatial clusters > 60 m apart so grouping must split
    scenes = []
    for s in range(2):
        sc = synthetic_scenario(
            cfg, seed=s, num_agents=10, arena_half=40.0, num_lanes=2,
            invalid_tail_agents=0,
        )
        tp = sc.traj_position.copy()
        tp[5:] += 200.0  # second cluster far away
        gp = sc.goal_position.copy()
        gp[5:] += 200.0
        scenes.append(dataclasses.replace(sc, traj_position=tp, goal_position=gp))
    sb = stack_scenarios(scenes, cfg)
    sbj = _jnp_scenario(sb)

    # tiny model init via the small-crop training pipeline
    mcfg = load_config({**SMALL, "sim.max_agents": 4})
    train_scene = synthetic_scenario(
        mcfg, seed=7, num_agents=4, arena_half=40.0, num_lanes=2,
        invalid_tail_agents=0,
    )
    tb_s = stack_scenarios([train_scene], mcfg)
    tb_j = _jnp_scenario(tb_s)
    model = CtRLSim(cfg)
    offline = generate_offline_data(mcfg, tb_j)
    tb = build_train_batch(mcfg, jax.random.PRNGKey(0), tb_j, offline)
    params = model.init({"params": jax.random.PRNGKey(0)}, tb)
    return cfg, model, params, sb, sbj


def ref_build_groups(cfg, pos0, exist0, lengths, evaluated):
    """Literal port of the reference's grouping loop
    (autoregressive_policy.py:88-137) for ONE scene, without the
    mutate-while-iterating defect (documented in groups.py)."""
    Am = cfg.waymo.max_num_agents
    order = np.argsort(np.array([lengths[v] for v in evaluated]))[::-1]
    unaccounted = [evaluated[i] for i in order]
    out = []
    while unaccounted:
        focal = unaccounted.pop(0)
        if not exist0[focal]:
            continue
        dist = np.linalg.norm(pos0 - pos0[focal][None], axis=-1)
        valid_agents = np.where((dist < cfg.waymo.agent_dist_threshold) & exist0)[0]
        closest_ag_ids = np.argsort(dist, kind="stable")[:Am]
        members = np.intersect1d(closest_ag_ids, valid_agents)
        assigned = [focal] + [v for v in unaccounted if v in set(members)]
        unaccounted = [v for v in unaccounted if v not in set(assigned)]
        out.append((list(members), assigned))
    return out


def test_group_construction_matches_reference_port(setup):
    cfg, _, _, sb, _ = setup
    controlled = np.zeros(sb.traj_position.shape[:2], dtype=bool)
    # evaluate 3 vehicles in cluster 1 and 2 in cluster 2
    controlled[:, [0, 2, 4, 5, 7]] = True
    spec = build_focal_groups(
        cfg,
        np.asarray(sb.traj_position),
        np.asarray(sb.traj_valid).astype(bool),
        np.asarray(sb.agent_valid).astype(bool),
        controlled,
    )
    E = controlled.shape[0]
    for e in range(E):
        exist0 = np.asarray(sb.traj_valid)[e, :, 0] & np.asarray(sb.agent_valid)[e]
        lengths = np.asarray(sb.traj_valid)[e].sum(axis=1)
        ref = ref_build_groups(
            cfg, np.asarray(sb.traj_position)[e, :, 0], exist0, lengths,
            [int(i) for i in np.where(controlled[e])[0]],
        )
        assert len(ref) <= spec.num_groups
        for g, (members, assigned) in enumerate(ref):
            n = len(members)
            assert spec.group_valid[e, g]
            np.testing.assert_array_equal(spec.members[e, g, :n], members)
            assert not spec.member_valid[e, g, n:].any()
            got_assigned = [
                int(spec.members[e, g, s])
                for s in range(n)
                if spec.assigned[e, g, s]
            ]
            assert sorted(got_assigned) == sorted(assigned)
        # each evaluated vehicle assigned exactly once across groups
        counts = np.zeros(controlled.shape[1], int)
        for g in range(spec.num_groups):
            for s in range(cfg.waymo.max_num_agents):
                if spec.assigned[e, g, s]:
                    counts[int(spec.members[e, g, s])] += 1
        np.testing.assert_array_equal(counts[controlled[e]], 1)
        np.testing.assert_array_equal(counts[~controlled[e]], 0)


def test_scatter_by_rank_dedup():
    # agent 3 appears in groups 0 and 1: rank 0 wins
    members = jnp.asarray([[[1, 3, 5, 5], [2, 3, 5, 5]]], jnp.int32)  # [1,2,4]
    contrib = jnp.asarray([[[True, True, False, False]] * 2])
    vals = jnp.asarray([[[10.0, 11.0, 0.0, 0.0], [20.0, 21.0, 0.0, 0.0]]])
    table, covered = scatter_by_rank(vals, members, contrib, 5)
    np.testing.assert_allclose(np.asarray(table[0]), [0, 10, 20, 11, 0])
    np.testing.assert_array_equal(
        np.asarray(covered[0]), [False, True, True, True, False]
    )


@pytest.mark.parametrize("runner", ["exact", "streaming"])
def test_multigroup_rollout_end_to_end(setup, runner):
    cfg, model, params, sb, sbj = setup
    E, A = sb.traj_position.shape[:2]
    controlled = np.zeros((E, A), dtype=bool)
    controlled[:, [0, 2, 5, 7]] = True
    spec = build_focal_groups(
        cfg,
        np.asarray(sb.traj_position),
        np.asarray(sb.traj_valid).astype(bool),
        np.asarray(sb.agent_valid).astype(bool),
        controlled,
    )
    assert spec.num_groups >= 2  # the clusters cannot share one crop

    run = run_closed_loop if runner == "exact" else run_streaming
    fn = jax.jit(lambda s, p, c, r, g: run(cfg, model, p, s, c, r, None, groups=g))
    out = fn(
        sbj, params, jnp.asarray(controlled), jax.random.PRNGKey(0),
        jax.tree.map(jnp.asarray, spec),
    )
    exist = np.asarray(out.existence)
    assert np.isfinite(np.asarray(out.position)[exist > 0]).all()
    assert np.isfinite(np.asarray(out.reward8)).all()

    # uncontrolled agents log-replay through physics: close to GT
    pos = np.asarray(out.position).transpose(1, 2, 0, 3)  # [E, A, T+1, 2]
    gt = np.asarray(sb.traj_position)[:, :, : cfg.sim.steps + 1]
    ex = exist.transpose(1, 2, 0) > 0
    err = np.linalg.norm(pos - gt, axis=-1)
    replay_err = err[~controlled][ex[~controlled]]
    assert replay_err.mean() < 0.5, replay_err.mean()

    # controlled agents in BOTH clusters actually act (deviate from GT)
    ctrl_err = err[controlled][ex[controlled]]
    assert np.isfinite(ctrl_err).all()


@pytest.mark.parametrize("runner", ["exact", "streaming"])
def test_group_padding_invariance(setup, runner):
    """Padding the group axis with invalid groups is bitwise invisible."""
    cfg, model, params, sb, sbj = setup
    E, A = sb.traj_position.shape[:2]
    controlled = np.zeros((E, A), dtype=bool)
    controlled[:, [0, 2]] = True  # single cluster -> 1 group
    spec = build_focal_groups(
        cfg,
        np.asarray(sb.traj_position),
        np.asarray(sb.traj_valid).astype(bool),
        np.asarray(sb.agent_valid).astype(bool),
        controlled,
    )
    run = run_closed_loop if runner == "exact" else run_streaming
    fn = jax.jit(lambda s, p, c, r, g: run(cfg, model, p, s, c, r, None, groups=g))
    out1 = fn(
        sbj, params, jnp.asarray(controlled), jax.random.PRNGKey(3),
        jax.tree.map(jnp.asarray, spec),
    )
    out2 = fn(
        sbj, params, jnp.asarray(controlled), jax.random.PRNGKey(3),
        jax.tree.map(jnp.asarray, pad_groups(spec, spec.num_groups + 2)),
    )
    for f in out1._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(out1, f)), np.asarray(getattr(out2, f)), err_msg=f
        )
