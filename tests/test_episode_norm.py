"""episode_start_normalization: the training-side fix for the streaming
train/eval distribution gap (rollout/streaming.py module doc).

Under the flag, build_train_sample anchors the SE(2) frame and the
relevant-agent crop at EPISODE start (t=0) — exactly the fixed per-episode
frame the streaming rollout uses — instead of the reference's window-start
anchor (datasets/rl_waymo/dataset.py:390-428).

Pinned here:
1. the flagged sample's frame equals the origin agent's t=0 pose
   (manually recomputed with the streaming _make_frame formula);
2. when the window necessarily starts at t=0, flagged == unflagged bitwise
   (the flag is a strict generalization);
3. end-to-end: a tiny model trained under the flag, evaluated with BOTH
   rollout modes over episodes short enough that the exact-mode window
   anchor coincides with episode start, yields matching trajectories and
   eval metrics (streaming == exact under matching normalization).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import _set_dotted, load_config
from ctrl_sim_tpu.data import stack_scenarios, synthetic_scenario
from ctrl_sim_tpu.data.datagen import generate_offline_data
from ctrl_sim_tpu.data.pipeline import (
    build_train_batch,
    build_train_sample,
    compute_rtgs,
    goals_from_scenario,
)
from ctrl_sim_tpu.data.scenario import Scenario
from ctrl_sim_tpu.geometry import angle_sub, apply_se2

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


def _small_cfg(**extra):
    cfg = load_config()
    for k, v in {**SMALL, **extra}.items():
        cfg = _set_dotted(cfg, k, v)
    return cfg


def _scene_batch(cfg, n=2, seed0=0):
    scenes = [
        synthetic_scenario(cfg, seed=seed0 + s, num_agents=3, arena_half=60.0,
                           num_lanes=2, invalid_tail_agents=0)
        for s in range(n)
    ]
    sb = stack_scenarios(scenes, cfg)
    d = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in dataclasses.asdict(sb).items()}
    d["name"] = ""
    return sb, Scenario(**d)


def _sample_inputs(cfg, sbj):
    offline = generate_offline_data(cfg, sbj)
    rtgs = compute_rtgs(cfg, offline)
    goals = goals_from_scenario(sbj)
    return offline, rtgs, goals


def test_flag_anchors_frame_at_episode_start():
    cfg = _set_dotted(_small_cfg(), "waymo.episode_start_normalization", True)
    _, sbj = _scene_batch(cfg)
    offline, rtgs, goals = _sample_inputs(cfg, sbj)
    e = 0
    # hunt for a key whose window starts past t=0 so the two anchors differ
    sample = None
    for ks in range(40):
        key = jax.random.PRNGKey(ks)
        s = build_train_sample(
            cfg, key,
            offline.states[e], offline.actions[e], rtgs[e], goals[e],
            jnp.asarray(sbj.agent_valid)[e],
            jnp.asarray(sbj.road_points)[e], jnp.asarray(sbj.road_types)[e],
            jnp.asarray(sbj.road_valid)[e],
        )
        if int(s["timesteps"][0]) > 0:
            sample = s
            break
    assert sample is not None, "no key produced a window starting past t=0"

    gather_idx = np.asarray(sample["gather_idx"])
    slot_valid = np.asarray(sample["slot_valid"]).astype(bool)
    origin_slot = int(sample["origin_idx"])
    origin_agent = gather_idx[origin_slot]
    t_idx = np.asarray(sample["timesteps"])

    states = np.asarray(offline.states[e])  # [A, T, 8]
    # the streaming frame (_make_frame): origin pose at EPISODE start
    ox, oy, oyaw = states[origin_agent, 0, 0], states[origin_agent, 0, 1], states[origin_agent, 0, 4]
    rot = (np.pi / 2) + np.sign(-oyaw) * np.abs(oyaw)

    w = states[gather_idx][:, t_idx]  # [K, T_ctx, 8]
    exp_pos = np.asarray(
        apply_se2(jnp.asarray(w[..., :2]), jnp.asarray([ox, oy]), jnp.asarray(rot))
    )
    exp_hd = np.asarray(angle_sub(jnp.asarray(w[..., 4]), jnp.asarray(-rot)))

    got = np.asarray(sample["agent_states"])
    exist = w[..., -1] > 0
    m = slot_valid[:, None] & exist
    np.testing.assert_allclose(got[..., :2][m], exp_pos[m], atol=1e-4)
    np.testing.assert_allclose(got[..., 4][m], exp_hd[m], atol=1e-4)


def test_flag_is_noop_when_window_starts_at_zero():
    """With episode length == context length the window must start at t=0,
    where the two anchors coincide — flagged and unflagged samples agree
    bitwise."""
    cfg = _small_cfg(**{"sim.steps": 4})  # T = 5 == train_context_length
    cfg_flag = _set_dotted(cfg, "waymo.episode_start_normalization", True)
    _, sbj = _scene_batch(cfg)
    offline, rtgs, goals = _sample_inputs(cfg, sbj)
    key = jax.random.PRNGKey(7)
    args = (
        offline.states[0], offline.actions[0], rtgs[0], goals[0],
        jnp.asarray(sbj.agent_valid)[0],
        jnp.asarray(sbj.road_points)[0], jnp.asarray(sbj.road_types)[0],
        jnp.asarray(sbj.road_valid)[0],
    )
    a = build_train_sample(cfg, key, *args)
    b = build_train_sample(cfg_flag, key, *args)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


@pytest.mark.slow
def test_streaming_matches_exact_under_matching_normalization():
    """End-to-end (VERDICT item 3 'done' criterion): train a tiny model with
    episode_start_normalization, evaluate closed-loop with the streaming AND
    exact rollouts over episodes shorter than the context window (where the
    exact window anchor == episode start == the streaming frame), same PRNG:
    the sampled actions, trajectories and eval metrics must agree.

    The paper-parity configuration is the flag OFF + exact mode; the
    streaming-headline configuration is the flag ON + streaming mode. This
    test pins that under matching normalization the two rollouts are the
    same policy evaluation.
    """
    from ctrl_sim_tpu.evals.metrics import PolicyMetricsAccumulator
    from ctrl_sim_tpu.models.ctrl_sim import CtRLSim
    from ctrl_sim_tpu.rollout.rollout import run_closed_loop
    from ctrl_sim_tpu.rollout.streaming import run_streaming
    from ctrl_sim_tpu.training.trainer import Trainer

    cfg = _small_cfg(**{"sim.steps": 4, "sim.history_steps": 2,
                        "train.accum_steps": 1, "train.warmup_steps": 2,
                        "train.max_steps": 10})
    cfg = _set_dotted(cfg, "waymo.episode_start_normalization", True)
    sb, sbj = _scene_batch(cfg, n=2)

    offline = generate_offline_data(cfg, sbj)
    tb = build_train_batch(cfg, jax.random.PRNGKey(0), sbj, offline)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), tb)
    train_step = trainer.make_train_step()
    for i in range(3):
        batch = build_train_batch(cfg, jax.random.PRNGKey(10 + i), sbj, offline)
        state, losses = train_step(state, batch, jax.random.PRNGKey(20 + i))
    assert np.isfinite(float(losses.total))

    model = CtRLSim(cfg)
    controlled = jnp.asarray(sb.moving) & jnp.asarray(sb.agent_valid)
    key = jax.random.PRNGKey(3)
    ro_s = jax.jit(
        lambda s, p, c, r: run_streaming(cfg, model, p, s, c, r, None)
    )(sbj, state.params, controlled, key)
    ro_e = jax.jit(
        lambda s, p, c, r: run_closed_loop(cfg, model, p, s, c, r, None)
    )(sbj, state.params, controlled, key)

    np.testing.assert_allclose(
        np.asarray(ro_s.acceleration), np.asarray(ro_e.acceleration), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ro_s.position), np.asarray(ro_e.position), atol=1e-3
    )

    acc_s, acc_e = PolicyMetricsAccumulator(cfg), PolicyMetricsAccumulator(cfg)
    acc_s.update(jax.tree.map(np.asarray, ro_s), sb)
    acc_e.update(jax.tree.map(np.asarray, ro_e), sb)
    m_s, m_e = acc_s.compute(), acc_e.compute()
    for k in m_s:
        assert np.isclose(m_s[k], m_e[k], atol=1e-3), (k, m_s[k], m_e[k])
