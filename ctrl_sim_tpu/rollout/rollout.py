"""Batched closed-loop rollout: the TPU replacement for the per-scene Python
eval loop (evaluators/policy_evaluator.py:514-542).

Per env step, for every lane (scene) in parallel:

  record state -> build 32-step sliding window -> per focal group: gather
  <=24-agent crop -> SE(2) normalize -> discretize -> model pass 1 over all
  (scene, group) crops (tilted RTG sampling with cross-group dedup) ->
  model pass 2 (action sampling) -> controlled agents act, others log-replay
  through physics -> env.step -> collision/reward update

Everything — both transformer passes included — runs inside one
``lax.scan`` under ``jit``; there is no host synchronization during the
90-step rollout.

Semantics replicated from the reference:

- control handover at ``history_steps - 1`` (policy_evaluator.py:534)
- uncontrolled agents log-replay via inverse-bicycle actions through
  physics (evaluator.py:160-193), not teleport
- sticky relevant-agent sets per focal group that shrink when agents leave
  the 60 m radius and never re-add (autoregressive_policy.py:120-137);
  slots ordered by original agent index (np.intersect1d sorts)
- scenes with more agents than one 24-agent crop split into focal groups
  with one model call per group and cross-group RTG dedup — each agent's
  RTG sampled once, in the lowest-rank group containing it, and shared
  (autoregressive_policy.py:88-137,176-207); see rollout/groups.py
- RTGs sampled for every relevant agent, tilt applied only to controlled
  ones (autoregressive_policy.py:195-207)
- per-step reward computed on the pre-step state (policy_evaluator.py:515)
- on focal death the group re-centers on its longest-lived alive evaluated
  vehicle (the reference re-forms the group identically, see groups.py)

Documented deviation: an evaluated vehicle that leaves the 60 m radius of
its own (living) group's origin coasts (zero action through physics); the
reference's bookkeeping raises a KeyError in that case
(autoregressive_policy.py:255-259 indexing new_agent_idx_dict), so there is
no behavior to match.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.data import transforms as tf
from ctrl_sim_tpu.data.pipeline import goals_from_scenario
from ctrl_sim_tpu.data.scenario import Scenario
from ctrl_sim_tpu.env.dynamics import inverse_bicycle_action
from ctrl_sim_tpu.env.env import EnvState, WaymoEnv
from ctrl_sim_tpu.rollout.groups import (
    GroupSpec,
    gather_members,
    scatter_by_rank,
    trivial_groups,
)
from ctrl_sim_tpu.rollout.policy import sample_actions, sample_tilted_rtgs

Array = jax.Array


class RolloutOutput(NamedTuple):
    """Stacked per-step streams, time-major [T(+1), E, A, ...]."""

    position: Array
    velocity: Array
    heading: Array
    speed: Array
    existence: Array
    reward8: Array
    acceleration: Array  # [T, E, A]
    steering: Array
    nearest_dist: Array  # [T+1, E, A]
    rtgs: Array  # [T, E, A, 3] continuous sampled RTGs
    controlled_mask: Array  # [E, A]


class _Carry(NamedTuple):
    env_state: EnvState
    states_buf: Array  # [E, A, S, 8]
    actions_buf: Array  # [E, A, S, 2]
    rtgs_buf: Array  # [E, A, S, 3]
    relevant: Array  # [E, G, Am] bool — sticky per-group membership
    rng: Array
    rtg_rt: Array  # [E, A, 3] real-time decayed RTG (DT mode) or zeros


def _recorded_state(env_state: EnvState, length: Array, width: Array) -> Array:
    """(x, y, vx, vy, yaw, L, W, existence) from the env state
    — the Policy.update_state layout (policies/policy.py:68-79)."""
    b = env_state.bodies
    return jnp.concatenate(
        [
            b.position,
            b.velocity,
            b.heading[..., None],
            jnp.broadcast_to(length[..., None], b.heading.shape + (1,)),
            jnp.broadcast_to(width[..., None], b.heading.shape + (1,)),
            env_state.alive[..., None].astype(b.position.dtype),
        ],
        axis=-1,
    )


def _nearest_dist(position: Array, existence: Array) -> Array:
    """Unclipped nearest-vehicle distance at one timestep [E, A]
    (evaluator.py:87-103 via compute_dist_to_nearest_vehicle_rewards)."""
    return jax.vmap(
        lambda p, e: tf.compute_dist_to_nearest_vehicle_rewards(
            p[:, None, :], e[:, None], normalize=False
        )[:, 0]
    )(position, existence)


def dt_dense_reward3(cfg: Config, scenario: Scenario, env_state: EnvState, reward8: Array) -> Array:
    """Per-step dense 3-component reward for the DT policy's real-time RTG
    decay (evaluator.py:106-140 compute_dense_reward): goal-achieved, shaped
    nearest-vehicle minus collision, shaped road-edge minus collision."""
    wc = cfg.waymo
    ex_now = env_state.alive.astype(jnp.float32)
    nearest_now = _nearest_dist(env_state.bodies.position, ex_now)
    veh_dist = jnp.clip(nearest_now * ex_now, 0.0, wc.max_veh_veh_distance) / (
        wc.max_veh_veh_distance
    )
    from ctrl_sim_tpu.geometry import signed_distance_to_polylines

    signed = jax.vmap(
        lambda p, poly, v: signed_distance_to_polylines(p, poly, v)
    )(
        env_state.bodies.position,
        jnp.asarray(scenario.edge_polylines),
        jnp.asarray(scenario.edge_poly_valid),
    )
    dense_goal = reward8[..., 0] * wc.pos_target_achieved_rew_multiplier
    dense_veh = veh_dist - reward8[..., 6] * wc.veh_veh_collision_rew_multiplier
    dense_edge = (
        jnp.clip(jnp.abs(signed), 0.0, 5.0) / 5.0
        - reward8[..., 7] * wc.veh_edge_collision_rew_multiplier
    )
    return (
        jnp.stack([dense_goal, dense_veh, dense_edge], axis=-1)
        * ex_now[..., None]
    )


def select_focal_agents(scenario: Scenario, controlled_mask) -> Array:
    """Origin/focal agent per lane: the controlled vehicle with the longest
    GT existence (autoregressive_policy.py:88-94 sorts by trajectory
    length and picks the head)."""
    lengths = jnp.sum(jnp.asarray(scenario.traj_valid), axis=2)  # [E, A]
    keyed = jnp.where(controlled_mask, lengths, -1)
    return jnp.argmax(keyed, axis=1)


def default_groups(
    cfg: Config,
    scenario: Scenario,
    controlled_mask: Array,
    crop_size: int | None = None,
) -> GroupSpec:
    """Traceable single-group spec for scenes already at the crop size.

    ``crop_size`` < max_num_agents builds a PACKED spec (streaming only):
    the crop_size closest in-range agents compressed into the leading model
    slots — see rollout/groups.py:packed_trivial_groups."""
    wc = cfg.waymo
    tp = jnp.asarray(scenario.traj_position)
    if crop_size is None and tp.shape[1] != wc.max_num_agents:
        raise ValueError(
            f"scenes with more than max_num_agents={wc.max_num_agents} agent "
            f"slots (got {tp.shape[1]}) need host-built focal groups: pass "
            "groups=build_focal_groups(...)"
        )
    origin_idx = select_focal_agents(scenario, controlled_mask)
    pos0 = tp[:, :, 0]
    origin_pos0 = jnp.take_along_axis(pos0, origin_idx[:, None, None], axis=1)
    dist0 = jnp.linalg.norm(pos0 - origin_pos0, axis=-1)
    relevant0 = (
        (dist0 < wc.agent_dist_threshold)
        & jnp.asarray(scenario.agent_valid)
        & jnp.asarray(scenario.traj_valid)[:, :, 0]
    )
    gt_length = jnp.sum(jnp.asarray(scenario.traj_valid), axis=2)
    if crop_size is not None and crop_size != tp.shape[1]:
        from ctrl_sim_tpu.rollout.groups import packed_trivial_groups

        return packed_trivial_groups(
            cfg, origin_idx, relevant0, controlled_mask, gt_length, dist0,
            crop_size,
        )
    return trivial_groups(cfg, origin_idx, relevant0, controlled_mask, gt_length)


def run_closed_loop(
    cfg: Config,
    model,
    params,
    scenario: Scenario,
    controlled_mask: Array,  # [E, A]
    rng: Array,
    tilt_logits: Array | None = None,  # [num_bins, 3]
    groups: GroupSpec | None = None,
) -> RolloutOutput:
    """Exact-mode rollout: the sliding window is re-normalized and the full
    token sequence re-decoded every step (reference-parity path)."""
    wc = cfg.waymo
    pc = cfg.policy
    env = WaymoEnv(cfg)
    steps = cfg.sim.steps
    T_ctx = wc.train_context_length
    Am = wc.max_num_agents

    if groups is None:
        groups = default_groups(cfg, scenario, controlled_mask)
    groups = jax.tree.map(jnp.asarray, groups)
    G = groups.num_groups
    if groups.crop_size != Am:
        raise ValueError("GroupSpec crop size must equal waymo.max_num_agents")

    tp = jnp.asarray(scenario.traj_position)
    th = jnp.asarray(scenario.traj_heading)
    ts = jnp.asarray(scenario.traj_speed)
    tv = jnp.asarray(scenario.traj_valid)
    length = jnp.asarray(scenario.length)
    width = jnp.asarray(scenario.width)
    E, A = tp.shape[:2]  # A == sim agent axis, >= Am
    EG = E * G

    goals5 = goals_from_scenario(scenario)  # [E, A, 5]
    types = jax.nn.one_hot(jnp.asarray(scenario.agent_type), wc.num_agent_types)
    # tilt: [bins, 3] broadcast to controlled agents, or per-agent
    # [E, A, bins, 3] (planner-vs-adversary assigns different tilts per agent)
    if tilt_logits is None:
        tilt_logits = jnp.zeros((wc.rtg_discretization, 3))
    if tilt_logits.ndim == 2:
        agent_tilt = jnp.where(
            controlled_mask[..., None, None], tilt_logits[None, None], 0.0
        )
    else:
        agent_tilt = tilt_logits

    env_state0 = env.reset(scenario)

    # real-time RTG initialization (DT policy: policy_evaluator.py:123-145):
    # max achievable return (10, 90, 90); min_return flips evaluated
    # vehicles to (0, -10, -10)
    rtg_rt0 = jnp.broadcast_to(jnp.asarray([10.0, 90.0, 90.0]), (E, A, 3))
    if pc.min_return:
        rtg_rt0 = jnp.where(
            controlled_mask[..., None], jnp.asarray([0.0, -10.0, -10.0]), rtg_rt0
        )

    carry0 = _Carry(
        env_state=env_state0,
        states_buf=jnp.zeros((E, A, steps + 1, 8)),
        actions_buf=jnp.zeros((E, A, steps + 1, 2)),
        rtgs_buf=jnp.zeros((E, A, steps + 1, 3)),
        relevant=groups.member_valid,
        rng=rng,
        rtg_rt=rtg_rt0,
    )

    # static per-group road broadcast [E, P, ...] -> [EG, P, ...]
    def bcast_groups(x):
        return jnp.broadcast_to(x[:, None], (E, G) + x.shape[1:]).reshape(
            (EG,) + x.shape[1:]
        )

    roads_eg = bcast_groups(jnp.asarray(scenario.road_points))
    road_types_eg = bcast_groups(jnp.asarray(scenario.road_types))
    road_valid_eg = bcast_groups(jnp.asarray(scenario.road_valid))

    def model_inputs(carry: _Carry, t: Array):
        """Build the normalized, discretized 32-step window batch over all
        (scene, group) crop lanes."""
        w0 = jnp.maximum(t - (T_ctx - 1), 0)
        win_states = jax.lax.dynamic_slice_in_dim(carry.states_buf, w0, T_ctx, axis=2)
        win_actions = jax.lax.dynamic_slice_in_dim(carry.actions_buf, w0, T_ctx, axis=2)
        win_rtgs = jax.lax.dynamic_slice_in_dim(carry.rtgs_buf, w0, T_ctx, axis=2)
        timesteps = w0 + jnp.arange(T_ctx)  # [T_ctx]

        # ---- per-group origin (re-)election: longest-lived alive assigned
        # vehicle (the focal while it lives, autoregressive_policy.py:88-105)
        alive_slot = gather_members(carry.env_state.alive, groups.members)
        len_slot = gather_members(groups.gt_length, groups.members)
        okey = jnp.where(
            groups.assigned & alive_slot & carry.relevant, len_slot, -1.0
        )
        origin_slot_m = jnp.argmax(okey, axis=2)  # [E, G] (members space)
        group_alive = (jnp.max(okey, axis=2) >= 0) & groups.group_valid

        # ---- sticky 60 m shrink from the origin at the window anchor ------
        anchor_pos = win_states[..., 0, :2]  # [E, A, 2]
        anchor_slot = gather_members(anchor_pos, groups.members)  # [E, G, Am, 2]
        origin_anchor = jnp.take_along_axis(
            anchor_slot, origin_slot_m[..., None, None], axis=2
        )  # [E, G, 1, 2]
        dist = jnp.linalg.norm(anchor_slot - origin_anchor, axis=-1)
        relevant = carry.relevant & (dist < wc.agent_dist_threshold)

        # ---- repack slots: remaining members keep original-index order ----
        slot_ar = jnp.arange(Am)[None, None, :]
        slot_key = jnp.where(relevant, slot_ar, Am + slot_ar)
        order = jnp.argsort(slot_key, axis=2)  # [E, G, Am]
        gidx = jnp.take_along_axis(groups.members, order, axis=2)  # [E, G, Am]
        slot_valid = jnp.take_along_axis(relevant, order, axis=2)
        origin_slot = jnp.argmax(order == origin_slot_m[..., None], axis=2)

        def g(x):
            out = gather_members(x, gidx)
            mask_shape = slot_valid.shape + (1,) * (out.ndim - 3)
            return out * slot_valid.reshape(mask_shape).astype(out.dtype)

        s_states = g(win_states)  # [E, G, Am, T_ctx, 8]
        s_actions = g(win_actions)
        s_rtgs = g(win_rtgs)
        s_goals = g(goals5)
        s_types = jnp.where(slot_valid[..., None], gather_members(types, gidx), -1.0)

        # moving mask from episode start (autoregressive_policy.py:52-53)
        start_pos = carry.states_buf[:, :, 0, :2]
        moving = (
            jnp.linalg.norm(start_pos - goals5[..., :2], axis=-1)
            > wc.moving_threshold
        )
        s_moving = gather_members(moving, gidx) & slot_valid

        # normalize rtgs then discretize (autoregressive_policy.py:73-78,141-142)
        n_rtgs = tf.normalize_rtgs(s_rtgs, wc)
        d_rtgs = tf.discretize_rtgs(n_rtgs, wc) if pc.discretize_rtgs else n_rtgs
        d_actions = tf.discretize_actions(s_actions, wc)

        # normalize the scene per (scene, group) lane (origin at window anchor)
        norm = jax.vmap(
            lambda st, rp, rt, rv, go, oi: tf.normalize_scene(st, rp, rt, rv, go, oi, wc)
        )(
            s_states.reshape((EG, Am) + s_states.shape[3:]),
            roads_eg,
            road_types_eg,
            road_valid_eg,
            s_goals.reshape(EG, Am, -1),
            origin_slot.reshape(EG),
        )

        batch = {
            "agent_states": norm.agent_states,
            "agent_types": s_types.reshape(EG, Am, -1),
            "goals": norm.goals,
            "actions": d_actions.reshape(EG, Am, T_ctx),
            "rtgs": d_rtgs.reshape(EG, Am, T_ctx, 3),
            "timesteps": jnp.broadcast_to(timesteps[None, :], (EG, T_ctx)),
            "moving_agent_mask": s_moving.reshape(EG, Am).astype(jnp.float32),
            "road_points": norm.road_points,
            "road_types": norm.road_types,
        }
        return batch, gidx, slot_valid, group_alive, relevant

    def step_fn(carry: _Carry, t: Array):
        env_state = carry.env_state
        rng, k_rtg, k_act = jax.random.split(carry.rng, 3)

        # ---- record pre-step state + reward (policy_evaluator.py:515) ----
        reward8, env_state = env.reward(scenario, env_state)
        rec = _recorded_state(env_state, length, width)
        states_buf = jax.lax.dynamic_update_slice_in_dim(
            carry.states_buf, rec[:, :, None, :], t, axis=2
        )
        carry = carry._replace(states_buf=states_buf, env_state=env_state)

        rtg_rt = carry.rtg_rt
        if pc.real_time_rewards:
            # DT mode: RTG buffer carries the decayed real-time return
            # (evaluator.py:106-140 compute_dense_reward + the decay at
            # policy_evaluator.py:146-149)
            rtgs_buf_rt = jax.lax.dynamic_update_slice_in_dim(
                carry.rtgs_buf, rtg_rt[:, :, None, :], t, axis=2
            )
            carry = carry._replace(rtgs_buf=rtgs_buf_rt)
            rtg_rt = rtg_rt - dt_dense_reward3(cfg, scenario, env_state, reward8)

        token_index = jnp.minimum(t, T_ctx - 1)
        batch, gidx, slot_valid, group_alive, relevant = model_inputs(carry, t)
        contrib = slot_valid & group_alive[..., None]

        # ---- pass 1: RTG prediction + cross-group dedup + tilted sampling --
        if pc.predict_rtgs:
            preds = model.apply(params, batch, deterministic=True)
            rtg_logits = preds.rtg_preds.reshape(
                EG, Am, T_ctx, wc.rtg_discretization, 3
            )
            cur = jax.lax.dynamic_index_in_dim(
                rtg_logits, token_index, axis=2, keepdims=False
            ).reshape(E, G, Am, wc.rtg_discretization, 3)
            # dedup: each agent's logits come from the lowest-rank group
            # containing it (the first group to process it in the reference)
            table_logits, covered = scatter_by_rank(cur, gidx, contrib, A)
            # tilt is indexed by original agent id — no slot gather needed
            rtg_bins = sample_tilted_rtgs(k_rtg, table_logits, agent_tilt)
            rtg_cont = tf.undiscretize_rtgs(rtg_bins, wc) * covered[..., None]
            # write the shared sampled bins into every group's input at the
            # current token (autoregressive_policy.py:185-207)
            bins_slot = gather_members(rtg_bins, gidx) * slot_valid[..., None]
            rtgs_in = batch["rtgs"]
            rtgs_in = jax.lax.dynamic_update_slice_in_dim(
                rtgs_in,
                bins_slot.reshape(EG, Am, 1, 3).astype(rtgs_in.dtype),
                token_index,
                axis=2,
            )
            batch = dict(batch, rtgs=rtgs_in)
        else:
            covered = jnp.zeros((E, A), bool)
            rtg_cont = jnp.zeros((E, A, 3))

        # ---- pass 2: action sampling (from the agent's winning group) -----
        preds = model.apply(params, batch, deterministic=True)
        logits = jax.lax.dynamic_index_in_dim(
            preds.action_preds, token_index, axis=2, keepdims=False
        ).reshape(E, G, Am, -1)
        table_action_logits, act_covered = scatter_by_rank(
            logits, gidx, contrib, A
        )
        action_ids = sample_actions(
            k_act,
            table_action_logits,
            pc.action_temperature,
            pc.nucleus_sampling,
            pc.nucleus_threshold,
        )
        policy_actions = tf.undiscretize_actions(action_ids, wc)  # [E, A, 2]
        # controlled agent outside every living group coasts (see module doc)
        policy_actions = policy_actions * act_covered[..., None]

        # ---- choose applied action per agent -----------------------------
        gt_accel, gt_steer = inverse_bicycle_action(
            tp[:, :, t + 1], th[:, :, t + 1], ts[:, :, t + 1],
            env_state.bodies.position, env_state.bodies.heading,
            env_state.bodies.speed, length, cfg.sim.dt,
        )
        replay_valid = env_state.alive & tv[:, :, t] & tv[:, :, t + 1]
        gt_accel = jnp.where(replay_valid, gt_accel, 0.0)
        gt_steer = jnp.where(replay_valid, gt_steer, 0.0)

        use_policy = controlled_mask & (t >= cfg.sim.history_steps - 1) & env_state.alive
        accel = jnp.where(use_policy, policy_actions[..., 0], gt_accel)
        steer = jnp.where(use_policy, policy_actions[..., 1], gt_steer)

        alive_next = env_state.alive & tv[:, :, t + 1]
        # replay agents die one step early (no valid next action)
        alive_next = alive_next & (use_policy | replay_valid)

        new_env_state, out = env.step(
            scenario, env_state, accel, steer,
            expert_mask=jnp.zeros_like(alive_next), alive_next=alive_next,
        )

        # ---- write buffers ----
        applied = jnp.stack([accel, steer], axis=-1)
        actions_buf = jax.lax.dynamic_update_slice_in_dim(
            carry.actions_buf, applied[:, :, None, :], t, axis=2
        )
        if pc.predict_rtgs:
            rtgs_buf = jax.lax.dynamic_update_slice_in_dim(
                carry.rtgs_buf, rtg_cont[:, :, None, :], t, axis=2
            )
        else:
            # DT real-time path wrote the decayed RTG above; IL/trajeglish
            # carry zeros
            rtgs_buf = carry.rtgs_buf

        nearest = _nearest_dist(
            env_state.bodies.position, env_state.alive.astype(jnp.float32)
        )

        ys = (
            env_state.bodies.position,
            env_state.bodies.velocity,
            env_state.bodies.heading,
            env_state.bodies.speed,
            env_state.alive.astype(jnp.float32),
            reward8,
            accel,
            steer,
            nearest,
            rtg_cont,
        )
        new_carry = _Carry(
            env_state=new_env_state,
            states_buf=states_buf,
            actions_buf=actions_buf,
            rtgs_buf=rtgs_buf,
            relevant=relevant,
            rng=rng,
            rtg_rt=rtg_rt,
        )
        return new_carry, ys

    final_carry, ys = jax.lax.scan(step_fn, carry0, jnp.arange(steps))
    (pos, vel, heading, speed, exist, reward8, accel, steer, nearest, rtgs) = ys

    # final state record (policy_evaluator.py:544-556)
    final_reward8, final_env = env.reward(scenario, final_carry.env_state)
    pos = jnp.concatenate([pos, final_env.bodies.position[None]], axis=0)
    vel = jnp.concatenate([vel, final_env.bodies.velocity[None]], axis=0)
    heading = jnp.concatenate([heading, final_env.bodies.heading[None]], axis=0)
    speed = jnp.concatenate([speed, final_env.bodies.speed[None]], axis=0)
    exist = jnp.concatenate(
        [exist, final_env.alive.astype(jnp.float32)[None]], axis=0
    )
    reward8 = jnp.concatenate([reward8, final_reward8[None]], axis=0)
    nearest_final = _nearest_dist(
        final_env.bodies.position, final_env.alive.astype(jnp.float32)
    )
    nearest = jnp.concatenate([nearest, nearest_final[None]], axis=0)

    return RolloutOutput(
        position=pos,
        velocity=vel,
        heading=heading,
        speed=speed,
        existence=exist,
        reward8=reward8,
        acceleration=accel,
        steering=steer,
        nearest_dist=nearest,
        rtgs=rtgs,
        controlled_mask=controlled_mask,
    )
