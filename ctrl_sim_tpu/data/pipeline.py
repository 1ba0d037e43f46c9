"""Train-sample construction: offline replay arrays -> model batches.

Port of RLWaymoDatasetCtRLSim.get_data (datasets/rl_waymo/dataset_ctrl_sim.py:38-160)
as a pure per-scenario function under ``vmap`` + PRNG keys: random 32-step
window before last existence, random moving origin agent, <=24-relevant-agent
crop with train-time shuffle, action/RTG discretization and SE(2) scene
normalization. The reference does this in numpy inside 6 dataloader worker
processes; here an entire global batch is built on device in one fused kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.data import transforms as tf
from ctrl_sim_tpu.data.datagen import OfflineArrays
from ctrl_sim_tpu.data.scenario import Scenario

Array = jax.Array


def goals_from_scenario(scenario: Scenario) -> Array:
    """[E, A, 5] goal vectors (x, y, vx, vy, heading) — extract_rawdata's
    goal layout (dataset.py:160-167)."""
    gp = jnp.asarray(scenario.goal_position)
    gh = jnp.asarray(scenario.goal_heading)
    gs = jnp.asarray(scenario.goal_speed)
    return jnp.concatenate(
        [
            gp,
            (gs * jnp.cos(gh))[..., None],
            (gs * jnp.sin(gh))[..., None],
            gh[..., None],
        ],
        axis=-1,
    )


def compute_rtgs(cfg: Config, offline: OfflineArrays) -> Array:
    """rewards8 -> normalized 3-component RTGs [E, A, T, 3]
    (dataset_ctrl_sim.py:93-105)."""
    existence = offline.states[..., -1]
    rewards5 = jax.vmap(
        lambda e, r, ve, vv: tf.compute_rewards5(e, r, ve, vv, cfg.waymo)
    )(existence, offline.rewards8, offline.veh_edge_dist_rewards, offline.veh_veh_dist_rewards)
    rtg5 = tf.reverse_cumsum_rtg(rewards5)
    rtg3 = tf.select_rtg_components(rtg5)
    return tf.normalize_rtgs(rtg3, cfg.waymo)


def build_train_sample(
    cfg: Config,
    key: Array,
    states: Array,  # [A, T, 8] recorded replay states
    actions: Array,  # [A, T, 2]
    rtgs: Array,  # [A, T, 3] normalized
    goals: Array,  # [A, 5]
    agent_valid: Array,  # [A]
    road_points: Array,  # [P, L, 3]
    road_types: Array,  # [P, 8]
    road_valid: Array,  # [P]
    focal_idx: Array | None = None,  # int, -1 = none (finetuning: adversary)
    supervise_focal_only: Array | None = None,  # bool
) -> dict:
    """One training sample for one scenario. vmap over the batch axis.

    Finetuning extensions (dataset_ctrl_sim_finetuning.py): when
    ``focal_idx >= 0`` and center_on_focal_agent, the origin agent is the
    focal (CAT adversary) agent; when ``supervise_focal_only``, the loss
    mask keeps only the focal agent (:160-163).
    """
    wc = cfg.waymo
    T_ctx = wc.train_context_length
    A, T, _ = states.shape
    existence = states[..., -1]

    k_window, k_origin, k_shuffle = jax.random.split(key, 3)

    # moving agents: >0.05 m from goal at t=0 (dataset_ctrl_sim.py:108)
    dist0 = jnp.linalg.norm(states[:, 0, :2] - goals[:, :2], axis=-1)
    moving = (dist0 > wc.moving_threshold) & agent_valid

    # agents valid for training: exist at t=0 (the reference's filtered_ag_ids
    # excludes only never-existing agents; raw loading keeps t0-valid agents)
    filtered = (existence[:, 0] > 0) & agent_valid

    # random window end before last existence of some moving agent
    last_exist = jnp.where(
        jnp.any(existence > 0, axis=1),
        (T - 1) - jnp.argmax(jnp.flip(existence, axis=1) > 0, axis=1),
        -1,
    )  # [A]
    max_t = jnp.max(jnp.where(moving, last_exist, -1)) - (T_ctx - 1)
    max_t = jnp.maximum(max_t, 0)
    origin_t = jax.random.randint(k_window, (), 0, max_t + 1)

    # window slice [origin_t : origin_t + T_ctx]
    t_idx = origin_t + jnp.arange(T_ctx)
    t_safe = jnp.minimum(t_idx, T - 1)
    w_states = jnp.take(states, t_safe, axis=1)
    w_actions = jnp.take(actions, t_safe, axis=1)
    w_rtgs = jnp.take(rtgs, t_safe, axis=1)
    in_episode = (t_idx < T)[None, :]
    w_states = w_states * in_episode[..., None]
    # (existence is part of w_states' last channel, so padding beyond the
    #  episode masks itself out)

    # random moving origin agent existing at window start
    # (dataset_ctrl_sim.py:30-35); under episode_start_normalization the
    # origin must exist at EPISODE start instead (filtered already requires
    # existence[:, 0] > 0), matching the streaming rollout's t=0 group build
    if wc.episode_start_normalization:
        cand = moving & filtered
    else:
        cand = (w_states[:, 0, -1] > 0) & moving & filtered
    logits = jnp.where(cand, 0.0, -jnp.inf)
    origin_agent = jax.random.categorical(k_origin, logits)
    if focal_idx is not None:
        use_focal = (focal_idx >= 0) & cfg.waymo.center_on_focal_agent
        origin_agent = jnp.where(use_focal, jnp.maximum(focal_idx, 0), origin_agent)

    # crop anchor positions: window start by default, episode start under
    # episode_start_normalization (streaming groups are built at t=0)
    crop_pos = (
        states[:, 0, :2] if wc.episode_start_normalization else w_states[:, 0, :2]
    )
    sel = tf.select_relevant_agents_idx(
        crop_pos,
        filtered,
        origin_agent,
        wc,
        shuffle_key=k_shuffle,
    )
    sel_states = tf.gather_agents(w_states, sel)
    sel_actions = tf.gather_agents(w_actions, sel)
    sel_rtgs = tf.gather_agents(w_rtgs, sel)
    sel_goals = tf.gather_agents(goals, sel)
    sel_moving = tf.gather_agents(moving.astype(jnp.float32), sel)
    if focal_idx is not None and supervise_focal_only is not None:
        # loss supervision restricted to the focal agent (finetuning :160-163)
        is_focal = (sel.gather_idx == jnp.maximum(focal_idx, 0)).astype(
            jnp.float32
        ) * sel.slot_valid
        sel_moving = jnp.where(
            supervise_focal_only & (focal_idx >= 0), is_focal, sel_moving
        )

    disc_actions = tf.discretize_actions(sel_actions, wc)
    disc_rtgs = tf.discretize_rtgs(sel_rtgs, wc)

    anchor_pose = None
    if wc.episode_start_normalization:
        # frame anchored at the origin agent's EPISODE-start pose (x, y, yaw)
        anchor_pose = jnp.stack(
            [
                states[origin_agent, 0, 0],
                states[origin_agent, 0, 1],
                states[origin_agent, 0, 4],
            ]
        )
    norm = tf.normalize_scene(
        sel_states,
        road_points,
        road_types,
        road_valid,
        sel_goals,
        sel.new_origin_idx,
        wc,
        anchor_pose=anchor_pose,
    )

    # agent types: gathered one-hot; invalid slots are -1 rows in the
    # reference (dataset.py:284) — the encoder multiplies by existence anyway
    return {
        "agent_states": norm.agent_states,  # [24, 32, 8]
        "goals": norm.goals,  # [24, 5]
        "actions": disc_actions,  # [24, 32]
        "rtgs": disc_rtgs,  # [24, 32, 3]
        "timesteps": t_safe,  # [32]
        "moving_agent_mask": sel_moving,  # [24]
        "road_points": norm.road_points,  # [200, 100, 3]
        "road_types": norm.road_types,  # [200, 8]
        "gather_idx": sel.gather_idx,
        "slot_valid": sel.slot_valid,
        "origin_idx": sel.new_origin_idx,
    }


def build_train_batch(
    cfg: Config,
    key: Array,
    scenario: Scenario,
    offline: OfflineArrays,
    agent_types: Array | None = None,
) -> dict:
    """Build a full model batch: vmap of build_train_sample over scenarios,
    then attach gathered agent-type one-hots."""
    E = offline.states.shape[0]
    rtgs = compute_rtgs(cfg, offline)
    goals = goals_from_scenario(scenario)
    keys = jax.random.split(key, E)
    batch = jax.vmap(
        lambda k, s, a, r, g, av, rp, rt, rv: build_train_sample(
            cfg, k, s, a, r, g, av, rp, rt, rv
        )
    )(
        keys,
        offline.states,
        offline.actions,
        rtgs,
        goals,
        jnp.asarray(scenario.agent_valid),
        jnp.asarray(scenario.road_points),
        jnp.asarray(scenario.road_types),
        jnp.asarray(scenario.road_valid),
    )
    # per-agent type one-hots gathered into selected slots
    type_onehot = jax.nn.one_hot(
        jnp.asarray(scenario.agent_type), cfg.waymo.num_agent_types
    )
    gathered_types = jax.vmap(jnp.take, in_axes=(0, 0, None))(
        type_onehot, batch["gather_idx"], 0
    )
    gathered_types = jnp.where(
        batch["slot_valid"][..., None], gathered_types, -1.0
    )
    batch["agent_types"] = gathered_types
    return batch
