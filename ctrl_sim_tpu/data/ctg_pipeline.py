"""CTG++ train-sample construction (reference:
datasets/rl_waymo/dataset_ctg_plus_plus.py).

Past(10)/future(22) split, per-agent local frames, 7-d pairwise relative
encodings, per-agent road crops, continuous action normalization to [-1, 1],
diffusion state normalization (pos/100, vel/40), RTGs discretized on the
past slice only. Pure functions under vmap + PRNG, fed by the same
OfflineArrays as the CtRL-Sim pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.data import transforms as tf
from ctrl_sim_tpu.data.datagen import OfflineArrays
from ctrl_sim_tpu.data.pipeline import compute_rtgs, goals_from_scenario
from ctrl_sim_tpu.data.scenario import Scenario
from ctrl_sim_tpu.geometry import angle_sub, apply_se2

Array = jax.Array


def agents_local_frame(
    states: Array,  # [A, T, 8] (x, y, vx, vy, yaw, L, W, exist)
    anchor: Array,  # [A, 8] per-agent anchor state (past[-1])
) -> Array:
    """Per-agent local frames (_get_agents_local_frame, :184-232): returns
    [A, T, 13] = [local(x, y, vx, vy, yaw), global(x, y, vx, vy, yaw), L, W, exist].
    Agents missing at the anchor keep zero local coords (the reference skips
    them; their rows are masked downstream)."""
    yaw = anchor[:, 4]
    rot = (jnp.pi / 2) + jnp.sign(-yaw) * jnp.abs(yaw)  # [A]
    trans = anchor[:, :2]  # [A, 2]
    valid = anchor[:, -1] > 0

    local_pos = jax.vmap(lambda s, t, r: apply_se2(s, t, r))(
        states[..., :2], trans, rot
    )
    local_vel = jax.vmap(lambda s, r: apply_se2(s, jnp.zeros(2), r))(
        states[..., 2:4], rot
    )
    local_yaw = angle_sub(states[..., 4], -rot[:, None])
    local5 = jnp.concatenate([local_pos, local_vel, local_yaw[..., None]], axis=-1)
    local5 = local5 * valid[:, None, None]
    # global block: [x, y, vx, vy, yaw]
    global5 = states[..., :5]
    return jnp.concatenate([local5, global5, states[..., 5:]], axis=-1)


def roads_local_frame(
    roads: Array,  # [A, P, L, 3] per-agent road crops (global coords)
    anchor: Array,  # [A, 8]
) -> Array:
    yaw = anchor[:, 4]
    rot = (jnp.pi / 2) + jnp.sign(-yaw) * jnp.abs(yaw)
    trans = anchor[:, :2]
    valid = anchor[:, -1] > 0
    xy = jax.vmap(lambda r, t, a: apply_se2(r, t, a))(roads[..., :2], trans, rot)
    xy = jnp.where(valid[:, None, None, None], xy, roads[..., :2])
    out = jnp.concatenate([xy, roads[..., 2:]], axis=-1)
    # zero rows where the point is invalid (:170)
    return out * (roads[..., -1:] > 0)


def goals_local_frame(goals: Array, anchor: Array) -> Array:
    yaw = anchor[:, 4]
    rot = (jnp.pi / 2) + jnp.sign(-yaw) * jnp.abs(yaw)
    trans = anchor[:, :2]
    valid = anchor[:, -1] > 0
    gp = jax.vmap(lambda g, t, r: apply_se2(g, t, r))(goals[..., :2], trans, rot)
    gv = jax.vmap(lambda g, r: apply_se2(g, jnp.zeros(2), r))(goals[..., 2:4], rot)
    gh = angle_sub(goals[..., 4], -rot)
    out = jnp.concatenate([gp, gv, gh[..., None]], axis=-1)
    return jnp.where(valid[:, None], out, goals)


def relative_encodings(
    in_states13: Array,  # [A, T, 13] local-frame states (with global block)
    present13: Array,  # [A, 13] present states
) -> Array:
    """7-d pairwise relative encodings (_prepare_relative_encodings, :76-118).

    rel[i, j, t] encodes agent j at step t in agent i's present frame:
      [0:2] R_i (pos_j_t - pos_i_present)
      [2]   cos(yaw_j_t - yaw_i_present)
      [3]   sin(yaw_j_t - yaw_i_present)
      [4]   |v_j_t| * rel[3] - |v_i_present|
      [5]   |v_j_t| * rel[4]        (replicated reference behavior)
      [6]   || pos_i_t - pos_j_t ||
    """
    A, T, _ = in_states13.shape
    present_heading = present13[:, 9]
    c = jnp.cos(-present_heading + jnp.pi / 2)
    s = jnp.sin(-present_heading + jnp.pi / 2)

    gpos = in_states13[..., 5:7]  # [A, T, 2]
    ppos = present13[:, 5:7]  # [A, 2]
    gyaw = in_states13[..., 9]
    pyaw = present13[:, 9]
    gspeed = jnp.linalg.norm(in_states13[..., 2:4], axis=-1)  # [A, T] (local vel)
    pspeed = jnp.linalg.norm(present13[:, 2:4], axis=-1)  # [A]

    offsets = gpos[None, :, :, :] - ppos[:, None, None, :]  # [i, j, T, 2]
    # rotated = offsets @ R_i.T with R_i = [[c, -s], [s, c]]
    rx = offsets[..., 0] * c[:, None, None] - offsets[..., 1] * s[:, None, None]
    ry = offsets[..., 0] * s[:, None, None] + offsets[..., 1] * c[:, None, None]

    yaw_off = gyaw[None, :, :] - pyaw[:, None, None]
    r2 = jnp.cos(yaw_off)
    r3 = jnp.sin(yaw_off)
    r4 = gspeed[None] * r3 - pspeed[:, None, None]
    r5 = gspeed[None] * r4
    r6 = jnp.linalg.norm(gpos[:, None] - gpos[None, :], axis=-1)  # [i, j, T]
    return jnp.stack([rx, ry, r2, r3, r4, r5, r6], axis=-1)


def select_agent_roads(
    anchor_pos: Array,  # [A, 2] present positions
    anchor_exist: Array,  # [A]
    road_points: Array,  # [P, L, 3]
    road_types: Array,  # [P, 8]
    road_valid: Array,  # [P]
    max_polylines: int,
) -> tuple[Array, Array]:
    """Per-agent top-K road crops (select_indiv_agent_roads, :120-141):
    keep the K polylines whose farthest valid point is nearest the agent.

    The reference branches on the *unpadded* polyline count: no sorting when
    it already fits the cap (order preserved, zero/-1 padding). The static
    shape P plays that role here: P <= max_polylines takes the no-sort
    branch exactly; a padded P > max_polylines with fewer real polylines
    sorts them by distance — a permutation of the reference's output, benign
    because the road tokens are consumed by permutation-invariant attention
    pooling."""
    A = anchor_pos.shape[0]
    P = road_points.shape[0]
    if P <= max_polylines:
        pad = max_polylines - P
        rp = jnp.broadcast_to(
            road_points[None], (A,) + road_points.shape
        )
        rt = jnp.broadcast_to(road_types[None], (A,) + road_types.shape)
        rp = rp * road_valid[None, :, None, None]
        rt = jnp.where(road_valid[None, :, None], rt, -1.0)
        if pad:
            rp = jnp.concatenate(
                [rp, jnp.zeros((A, pad) + road_points.shape[1:], rp.dtype)], axis=1
            )
            rt = jnp.concatenate(
                [rt, -jnp.ones((A, pad, road_types.shape[-1]), rt.dtype)], axis=1
            )
        rp = rp.at[..., -1].set(rp[..., -1] * anchor_exist[:, None, None])
        rt = rt * anchor_exist[:, None, None]
        return rp, rt
    dist = jnp.linalg.norm(
        road_points[None, :, :, :2] - anchor_pos[:, None, None, :], axis=-1
    )  # [A, P, L]
    dist = jnp.where(road_points[None, :, :, -1] > 0, dist, -jnp.inf)
    max_dist = jnp.max(dist, axis=-1)  # [A, P]
    max_dist = jnp.where(road_valid[None, :], max_dist, jnp.inf)
    max_dist = jnp.where(jnp.isneginf(max_dist), jnp.inf, max_dist)
    keep = jnp.argsort(max_dist, axis=-1)[:, :max_polylines]  # [A, K]
    rp = jnp.take(road_points, keep, axis=0)  # [A, K, L, 3]
    rt = jnp.take(road_types, keep, axis=0)  # [A, K, 8]
    kept_valid = jnp.take(road_valid, keep)  # [A, K]
    rp = rp * kept_valid[..., None, None]
    rt = jnp.where(kept_valid[..., None], rt, -1.0)
    # mask by agent existence (:138-139)
    rp = rp.at[..., -1].set(rp[..., -1] * anchor_exist[:, None, None])
    rt = rt * anchor_exist[:, None, None]
    return rp, rt


def build_ctg_sample(
    cfg: Config,
    key: Array,
    states: Array,  # [A, T, 8]
    actions: Array,  # [A, T, 2]
    rtgs: Array,  # [A, T, 3] normalized
    goals: Array,  # [A, 5]
    agent_valid: Array,
    road_points: Array,
    road_types: Array,
    road_valid: Array,
    train: bool = True,
) -> dict:
    wc = cfg.waymo
    T_ctx = wc.train_context_length
    T_in = wc.input_horizon
    A, T, _ = states.shape
    existence = states[..., -1]

    k_window, k_origin, k_shuffle = jax.random.split(key, 3)

    dist0 = jnp.linalg.norm(states[:, 0, :2] - goals[:, :2], axis=-1)
    moving = (dist0 > wc.moving_threshold) & agent_valid
    filtered = (existence[:, 0] > 0) & agent_valid

    last_exist = jnp.where(
        jnp.any(existence > 0, axis=1),
        (T - 1) - jnp.argmax(jnp.flip(existence, axis=1) > 0, axis=1),
        -1,
    )
    max_t = jnp.max(jnp.where(moving, last_exist, -1)) - (T_in + 1)
    max_t = jnp.maximum(max_t, 0)
    origin_t = jax.random.randint(k_window, (), 0, max_t + 1)

    t_idx = origin_t + jnp.arange(T_ctx)
    t_safe = jnp.minimum(t_idx, T - 1)
    in_episode = (t_idx < T)[None, :]
    w_states = jnp.take(states, t_safe, axis=1) * in_episode[..., None]
    # action alignment: a[t] is the action *into* state t
    # (dataset_ctg_plus_plus.py:337-342): shift right by one, zero at start
    ta = jnp.maximum(t_idx - 1, 0)
    ta_safe = jnp.minimum(ta, T - 1)
    w_actions = jnp.take(actions, ta_safe, axis=1)
    w_actions = w_actions * ((t_idx > 0) & (t_idx - 1 < T))[None, :, None]
    w_rtgs = jnp.take(rtgs, t_safe, axis=1) * in_episode[..., None]

    # origin agent must exist at the present step (window index T_in)
    cand = (w_states[:, T_in, -1] > 0) & moving & filtered
    logits = jnp.where(cand, 0.0, -jnp.inf)
    origin_agent = jax.random.categorical(k_origin, logits)

    sel = tf.select_relevant_agents_idx(
        w_states[:, 0, :2], filtered, origin_agent, wc,
        shuffle_key=k_shuffle if train else None,
    )
    s_states = tf.gather_agents(w_states, sel)
    s_actions = tf.gather_agents(w_actions, sel)
    s_rtgs = tf.gather_agents(w_rtgs, sel)
    s_goals = tf.gather_agents(goals, sel)
    s_moving = tf.gather_agents(moving.astype(jnp.float32), sel)

    past = s_states[:, :T_in]
    future = s_states[:, T_in:]
    anchor = past[:, -1]  # present states [K, 8]

    rp, rt = select_agent_roads(
        anchor[:, :2], (anchor[:, -1] > 0).astype(jnp.float32),
        road_points, road_types, road_valid, wc.max_num_road_polylines,
    )

    past13 = agents_local_frame(past, anchor)
    future13 = agents_local_frame(future, anchor)
    rp = roads_local_frame(rp, anchor)
    n_goals = goals_local_frame(s_goals, anchor)

    present13 = past13[:, -1]
    past_rel = relative_encodings(past13, present13)  # [K, K, T_in, 7]
    if wc.future_relative_encoding:
        future_rel = relative_encodings(future13, present13)
    else:
        future_rel = jnp.broadcast_to(
            past_rel[:, :, -1:, :],
            past_rel.shape[:2] + (T_ctx - T_in, 7),
        )

    # strip global coords (:398-400): past keeps [local5, L, W, exist];
    # future keeps [local5, exist]
    past8 = jnp.concatenate([past13[..., 0:5], past13[..., 10:]], axis=-1)
    future6 = jnp.concatenate([future13[..., 0:5], future13[..., -1:]], axis=-1)

    # diffusion normalization (:403-408)
    pos_div, vel_div = wc.pos_div, wc.vel_div
    past8 = past8.at[..., :2].divide(pos_div).at[..., 2:4].divide(vel_div)
    future6 = future6.at[..., :2].divide(pos_div).at[..., 2:4].divide(vel_div)
    n_goals = n_goals.at[..., :2].divide(pos_div).at[..., 2:4].divide(vel_div)
    rp = rp.at[..., :2].divide(pos_div)

    # continuous action normalization to [-1, 1] (:234-240)
    def norm_actions(a):
        accel = (jnp.clip(a[..., 0], wc.min_accel, wc.max_accel) - wc.min_accel) / (
            wc.max_accel - wc.min_accel
        )
        steer = (jnp.clip(a[..., 1], wc.min_steer, wc.max_steer) - wc.min_steer) / (
            wc.max_steer - wc.min_steer
        )
        return 2.0 * jnp.stack([accel, steer], axis=-1) - 1.0

    n_actions = norm_actions(s_actions)
    disc_rtgs = tf.discretize_rtgs(s_rtgs, wc)[:, :T_in]

    present_t = origin_t + T_in - 1
    timesteps = jnp.full((T_ctx,), present_t, jnp.int32)

    return {
        "agent_past_states": past8,  # [K, T_in, 8]
        "agent_past_actions": n_actions[:, :T_in],
        "agent_future_states": future6,  # [K, T_out, 6]
        "agent_future_actions": n_actions[:, T_in:],
        "past_relative_encodings": past_rel,
        "future_relative_encodings": future_rel,
        "goals": n_goals,
        "rtgs": disc_rtgs,
        "timesteps": timesteps,
        "moving_agent_mask": s_moving,
        "road_points": rp,  # [K, P, L, 3]
        "road_types": rt,
        "gather_idx": sel.gather_idx,
        "slot_valid": sel.slot_valid,
        "origin_idx": sel.new_origin_idx,
        "anchor": anchor,
    }


def build_ctg_batch(
    cfg: Config,
    key: Array,
    scenario: Scenario,
    offline: OfflineArrays,
    train: bool = True,
) -> dict:
    E = offline.states.shape[0]
    rtgs = compute_rtgs(cfg, offline)
    goals = goals_from_scenario(scenario)
    keys = jax.random.split(key, E)
    batch = jax.vmap(
        lambda k, s, a, r, g, av, rp, rt, rv: build_ctg_sample(
            cfg, k, s, a, r, g, av, rp, rt, rv, train
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
    type_onehot = jax.nn.one_hot(
        jnp.asarray(scenario.agent_type), cfg.waymo.num_agent_types
    )
    gathered = jax.vmap(jnp.take, in_axes=(0, 0, None))(
        type_onehot, batch["gather_idx"], 0
    )
    batch["agent_types"] = jnp.where(
        batch["slot_valid"][..., None], gathered, -1.0
    )
    return batch
