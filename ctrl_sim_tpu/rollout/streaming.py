"""Streaming closed-loop rollout: incremental KV-cached decoding.

The exact-mode rollout (rollout.py) re-normalizes and re-decodes the full
2304-token window twice per env step — faithful to the reference but
~50x more FLOPs than necessary. This path exploits the autoregressive
structure:

- the normalization frame is fixed per (scene, group) lane (origin agent
  pose at episode start), so past token embeddings never change;
- the cross-attention memory (map polylines + initial states) is encoded
  once per episode;
- each env step appends only 3*A new tokens (state -> rtg -> action) against
  a ring-buffer KV cache, with the multi-agent causal predicate evaluated
  against the cache's slot->timestep map;
- the 3 sub-passes are batched into 2 decoder passes per step: the action
  tokens' head outputs are never used in rollout, so their decode is
  deferred one step and fused with the next state pass
  (stream_action_state) — each pass reads the full cache once per layer,
  so this is a 1.5x cut of the rollout's dominant HBM traffic;
- the cross-attention memory K/V are projected once per episode
  (precompute_memory_kv) instead of per layer per pass per step;
- the sliding 32-step context becomes a window constraint in the mask
  instead of a re-built input.

Cost per step: O(2*A*window*A*K) attention + O(A) projections, vs
O((T*A*K)^2) full re-decode.

Multi-group scenes (> max_num_agents agents): the env holds the full scene;
each focal group (rollout/groups.py) is its own model lane with a fixed
member index map, its own frame, memory, and KV cache. RTGs are deduped
across groups per step by rank-ordered scatter, sampled once per agent, and
the shared bins streamed into every group's cache — mirroring
autoregressive_policy.py:176-207.

Semantics deviation vs the reference (documented): the frame is anchored at
episode start rather than re-anchored at each window start, and agent slots
are not re-sorted when agents leave the 60 m radius (they are masked
instead). Models intended for streaming eval should train with
``waymo.episode_start_normalization=True`` (data/pipeline.py then anchors
the training frame + crop at episode start) so train and eval see the same
frames; the exact-mode path remains for reference-parity evaluation.
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
from ctrl_sim_tpu.geometry import angle_sub, apply_se2
from ctrl_sim_tpu.models.decoder import KVCache
from ctrl_sim_tpu.rollout.groups import (
    GroupSpec,
    gather_members,
    scatter_by_rank,
)
from ctrl_sim_tpu.rollout.policy import sample_actions, sample_tilted_rtgs
from ctrl_sim_tpu.rollout.rollout import (
    RolloutOutput,
    default_groups,
    dt_dense_reward3,
)

Array = jax.Array


class _Frame(NamedTuple):
    """Per-model-lane fixed SE(2) normalization frame."""

    translation: Array  # [EG, 2]
    rotation: Array  # [EG]


def _make_frame(origin_pos: Array, origin_yaw: Array) -> _Frame:
    """normalize_scene's frame (dataset.py:390-394): rotate by
    pi/2 + sign(-yaw)*|yaw| about the origin agent's position."""
    rot = (jnp.pi / 2) + jnp.sign(-origin_yaw) * jnp.abs(origin_yaw)
    return _Frame(translation=origin_pos, rotation=rot)


def _normalize_states(
    frame: _Frame,
    position: Array,  # [EG, Am, 2]
    velocity: Array,  # [EG, Am, 2]
    heading: Array,  # [EG, Am]
) -> tuple[Array, Array, Array]:
    """Apply the frame with the reference's exact conventions, including the
    negated-heading storage (angle_sub(h, -rot), dataset.py:403)."""
    f = jax.vmap(lambda t, r, p: apply_se2(p, t, r))
    pos = f(frame.translation, frame.rotation, position)
    vel = f(jnp.zeros_like(frame.translation), frame.rotation, velocity)
    hd = angle_sub(heading, -frame.rotation[:, None])
    return pos, vel, hd


def run_streaming(
    cfg: Config,
    model,
    params,
    scenario: Scenario,
    controlled_mask: Array,  # [E, A]
    rng: Array,
    tilt_logits: Array | None = None,
    groups: GroupSpec | None = None,
) -> RolloutOutput:
    wc = cfg.waymo
    mc = cfg.model
    pc = cfg.policy
    env = WaymoEnv(cfg)
    steps = cfg.sim.steps
    window = wc.train_context_length
    K = mc.num_token_types
    H = mc.hidden_dim
    dtype = jnp.dtype(mc.compute_dtype)

    if groups is None:
        groups = default_groups(
            cfg, scenario, controlled_mask,
            crop_size=cfg.eval.agent_slots or None,
        )
    groups = jax.tree.map(jnp.asarray, groups)
    G = groups.num_groups
    # packed agent slots: the model crop may use FEWER slots than
    # waymo.max_num_agents when every in-range agent fits (the KV-cache DMA
    # is the rollout's dominant cost and scales with slots, not real agents
    # — BENCH_NOTES.md). Slot a still gets agent-id embedding a, exactly the
    # id the same agent would get in a full-width crop (members are packed
    # in original-index order, pads at the tail). The single deviation vs a
    # full-width crop: the model no longer attends the pad slots'
    # zero-embedding "phantom" keys (their count varies per training scene
    # anyway); measured at the metric level in tests/test_packed_slots.py.
    Am = groups.crop_size
    if Am > wc.max_num_agents:
        raise ValueError(
            f"GroupSpec crop size {Am} exceeds waymo.max_num_agents "
            f"{wc.max_num_agents}"
        )

    tp = jnp.asarray(scenario.traj_position)
    th = jnp.asarray(scenario.traj_heading)
    ts = jnp.asarray(scenario.traj_speed)
    tv = jnp.asarray(scenario.traj_valid)
    length = jnp.asarray(scenario.length)
    width = jnp.asarray(scenario.width)
    E, A = tp.shape[:2]
    EG = E * G

    goals5 = goals_from_scenario(scenario)
    types = jax.nn.one_hot(jnp.asarray(scenario.agent_type), wc.num_agent_types)
    if tilt_logits is None:
        tilt_logits = jnp.zeros((wc.rtg_discretization, 3))
    if tilt_logits.ndim == 2:
        agent_tilt = jnp.where(
            controlled_mask[..., None, None], tilt_logits[None, None], 0.0
        )
    else:
        agent_tilt = tilt_logits

    env_state0 = env.reset(scenario)

    def eg(x):
        """[E, G, Am, ...] -> [EG, Am, ...]"""
        return x.reshape((EG,) + x.shape[2:])

    # ---- fixed per-group frame from the t=0 origin's pose -----------------
    alive0_slot = gather_members(env_state0.alive, groups.members)
    len_slot = gather_members(groups.gt_length, groups.members)
    okey0 = jnp.where(
        groups.assigned & alive0_slot & groups.member_valid, len_slot, -1.0
    )
    origin_slot = jnp.argmax(okey0, axis=2)  # [E, G] — fixed for the episode
    pos_slot0 = gather_members(env_state0.bodies.position, groups.members)
    yaw_slot0 = gather_members(env_state0.bodies.heading, groups.members)
    opos = eg(jnp.take_along_axis(pos_slot0, origin_slot[..., None, None], axis=2))[
        :, 0
    ]
    oyaw = eg(jnp.take_along_axis(yaw_slot0, origin_slot[..., None], axis=2))[:, 0]
    frame = _make_frame(opos, oyaw)

    # per-group static gathers
    goals_slot = eg(gather_members(goals5, groups.members))  # [EG, Am, 5]
    types_slot = eg(gather_members(types, groups.members))
    length_slot = eg(gather_members(length, groups.members))
    width_slot = eg(gather_members(width, groups.members))
    tilt_slot = eg(gather_members(agent_tilt, groups.members))

    # ---- normalize static inputs once ------------------------------------
    n_goal_pos = jax.vmap(lambda t_, r, p: apply_se2(p, t_, r))(
        frame.translation, frame.rotation, goals_slot[..., :2]
    )
    n_goal_vel = jax.vmap(lambda r, p: apply_se2(p, jnp.zeros(2), r))(
        frame.rotation, goals_slot[..., 2:4]
    )
    n_goal_hd = angle_sub(goals_slot[..., 4], -frame.rotation[:, None])
    n_goals = jnp.concatenate(
        [n_goal_pos, n_goal_vel, n_goal_hd[..., None]], axis=-1
    )

    def bcast_groups(x):
        return jnp.broadcast_to(x[:, None], (E, G) + x.shape[1:]).reshape(
            (EG,) + x.shape[1:]
        )

    road_points = bcast_groups(jnp.asarray(scenario.road_points))
    road_types_eg = bcast_groups(jnp.asarray(scenario.road_types))
    road_valid_eg = bcast_groups(jnp.asarray(scenario.road_valid))
    rp_xy = jax.vmap(lambda t_, r, p: apply_se2(p, t_, r))(
        frame.translation, frame.rotation, road_points[..., :2]
    )
    n_roads = jnp.concatenate([rp_xy, road_points[..., 2:]], axis=-1)
    n_roads = n_roads * (road_points[..., -1:] > 0)  # keep pad zeros exact

    # keep the <=max_num_road_polylines closest polylines in the (fixed)
    # frame — the same crop normalize_scene applies per window in exact mode
    # (dataset.py:415-426); without it the streaming map memory sees a
    # different polyline set than training did
    cap = wc.max_num_road_polylines
    if n_roads.shape[1] > cap:
        max_dist = jnp.max(
            jnp.linalg.norm(n_roads[..., :2], axis=-1) * n_roads[..., -1], axis=2
        )  # [EG, P]
        max_dist = jnp.where(road_valid_eg, max_dist, jnp.inf)
        keep = jnp.argsort(max_dist, axis=1)[:, :cap]  # [EG, cap]
        n_roads = jnp.take_along_axis(n_roads, keep[:, :, None, None], axis=1)
        road_types_eg = jnp.take_along_axis(
            road_types_eg, keep[:, :, None], axis=1
        )
        kept_valid = jnp.take_along_axis(road_valid_eg, keep, axis=1)
        n_roads = n_roads * kept_valid[:, :, None, None].astype(n_roads.dtype)
        road_types_eg = jnp.where(kept_valid[:, :, None], road_types_eg, -1.0)
    else:
        n_roads = n_roads * road_valid_eg[:, :, None, None].astype(n_roads.dtype)
        road_types_eg = jnp.where(road_valid_eg[:, :, None], road_types_eg, -1.0)

    # relevant set at t=0 = sticky group membership
    relevant0 = groups.member_valid

    # ---- memory (map + initial states) encoded once ----------------------
    pos0, vel0, hd0 = _normalize_states(
        frame,
        eg(pos_slot0),
        eg(gather_members(env_state0.bodies.velocity, groups.members)),
        eg(yaw_slot0),
    )
    init_exist = (eg(alive0_slot & relevant0)).astype(jnp.float32)
    init_states12 = jnp.concatenate(
        [
            pos0,
            vel0,
            hd0[..., None],
            length_slot[..., None],
            width_slot[..., None],
            types_slot,
        ],
        axis=-1,
    )
    memory, memory_valid = model.apply(
        params,
        road_types_eg,
        method=lambda m, rt: m.encode_rollout_memory(
            n_roads, rt, init_states12, n_goals, init_exist, jnp.asarray(0, jnp.int32)
        ),
    )
    # cross-attention K/V over the static memory, projected once per episode
    memory_kv = model.apply(
        params, memory, method=lambda m, mem: m.precompute_memory_kv(mem)
    )

    cache_dtype = (
        jnp.int8 if mc.kv_cache_dtype == "int8" else dtype
    )
    cache0 = KVCache.create(
        mc.num_decoder_layers, EG, window, Am, K, H, cache_dtype
    )

    moving_ag = (
        jnp.linalg.norm(env_state0.bodies.position - goals5[..., :2], axis=-1)
        > wc.moving_threshold
    )
    del moving_ag  # moving mask only affects training losses, not rollout

    # real-time RTG initialization (DT policy: policy_evaluator.py:123-145)
    rtg_rt0 = jnp.broadcast_to(jnp.asarray([10.0, 90.0, 90.0]), (E, A, 3))
    if getattr(pc, "min_return", False):
        rtg_rt0 = jnp.where(
            controlled_mask[..., None], jnp.asarray([0.0, -10.0, -10.0]), rtg_rt0
        )

    # the fused 2-pass default family: the ring-slot labels are a closed
    # form of t, so both passes' [Q, N] masks are precomputed for every
    # step OUTSIDE the scan and streamed in as scan inputs — the per-step
    # coordinate/predicate fusions disappear from the loop body
    default_family = not (mc.trajeglish or mc.il or mc.decision_transformer)
    use_premask = default_family and cfg.eval.streaming_passes < 3
    if use_premask:
        from ctrl_sim_tpu.ops.masks import stream_step_masks

        premask1, premask2 = stream_step_masks(
            steps, window, Am, K, mc.state_token_index,
            mc.attend_own_return_action,
        )

    class Carry(NamedTuple):
        env_state: EnvState
        cache: KVCache
        relevant: Array  # [E, G, Am]
        rng: Array
        prev_action_ids: Array  # [EG, Am] — actions applied at t-1 (slot space)
        prev_exist: Array  # [EG, Am] — model existence at t-1
        rtg_rt: Array  # [E, A, 3] — DT real-time decayed RTG (zeros otherwise)

    def step_fn(carry: Carry, scan_in):
        if use_premask:
            t, mask1_t, mask2_t = scan_in
        else:
            t = scan_in
            mask1_t = mask2_t = None
        env_state = carry.env_state
        rng, k_rtg, k_act = jax.random.split(carry.rng, 3)

        reward8, env_state = env.reward(scenario, env_state)

        # relevant set shrinks with distance to the (fixed) origin's current
        # position; slots are masked, never re-sorted (streaming deviation)
        pos_slot = gather_members(env_state.bodies.position, groups.members)
        cur_opos = jnp.take_along_axis(
            pos_slot, origin_slot[..., None, None], axis=2
        )
        dist = jnp.linalg.norm(pos_slot - cur_opos, axis=-1)
        relevant = carry.relevant & (dist < wc.agent_dist_threshold)
        alive_slot = gather_members(env_state.alive, groups.members)
        group_alive = (
            jnp.any(groups.assigned & alive_slot & relevant, axis=2)
            & groups.group_valid
        )
        model_exist_g = alive_slot & relevant  # [E, G, Am]
        model_exist = eg(model_exist_g).astype(jnp.float32)  # [EG, Am]

        p, v, hd = _normalize_states(
            frame,
            eg(pos_slot),
            eg(gather_members(env_state.bodies.velocity, groups.members)),
            eg(gather_members(env_state.bodies.heading, groups.members)),
        )
        states12 = jnp.concatenate(
            [p, v, hd[..., None], length_slot[..., None], width_slot[..., None],
             types_slot],
            axis=-1,
        )

        # ---- family-specific decode passes ---------------------------------
        # Every family defers the previous step's action tokens into the
        # current step's first pass (their head outputs are unused in
        # rollout, only their K/V matter — see stream_action_state).
        a_ids = jnp.broadcast_to(jnp.arange(Am)[None, :], (EG, Am)).astype(jnp.int32)
        tprev_ids = jnp.full_like(a_ids, jnp.maximum(t - 1, 0))
        tcur_ids = jnp.full_like(a_ids, t)
        rtg_rt = carry.rtg_rt
        rtg_cont = jnp.zeros((E, A, 3))
        covered = jnp.zeros((E, A), bool)

        if mc.trajeglish:
            # action-only layout (K=1): ONE pass per step — rewrite of the
            # applied t-1 action + a zero-action probe at t whose output row
            # predicts this step's action (matching exact mode, where the
            # window's slot t holds a discretized zero action at predict time)
            probe_ids = tf.discretize_actions(jnp.zeros((EG, Am, 2)), wc).astype(
                jnp.int32
            )

            def fused(m):
                e_prev = m.encoder.embed_action_tokens(
                    carry.prev_action_ids, tprev_ids, a_ids,
                    carry.prev_exist[..., None],
                )
                e_probe = m.encoder.embed_action_tokens(
                    probe_ids, tcur_ids, a_ids, model_exist[..., None]
                )
                emb = m.encoder.embed_ln(jnp.concatenate([e_prev, e_probe], axis=1))
                return m.decoder.decode_step_groups(
                    [(emb[:, :Am], 0, t - 1), (emb[:, Am:], 0, t)],
                    carry.cache, memory, memory_valid, window,
                    memory_kv=memory_kv,
                )

            x, cache = model.apply(params, method=fused)
            x_for_action = x[:, Am:]
        elif mc.il:
            # (state, action) layout (K=2): ONE pass per step; the action
            # head reads the state-token stream
            def fused(m):
                e_prev = m.encoder.embed_action_tokens(
                    carry.prev_action_ids, tprev_ids, a_ids,
                    carry.prev_exist[..., None],
                )
                e_state = m.encoder.embed_state_tokens(
                    states12, n_goals, tcur_ids, a_ids, model_exist[..., None]
                )
                emb = m.encoder.embed_ln(jnp.concatenate([e_prev, e_state], axis=1))
                return m.decoder.decode_step_groups(
                    [(emb[:, :Am], 1, t - 1), (emb[:, Am:], 0, t)],
                    carry.cache, memory, memory_valid, window,
                    memory_kv=memory_kv,
                )

            x, cache = model.apply(params, method=fused)
            x_for_action = x[:, Am:]
        elif mc.decision_transformer:
            # (rtg, state, action) layout: RTGs come from real-time decay,
            # not the model, so the whole step is ONE pass; note the mask's
            # stage-2 rule makes the rtg token see the same step's state
            # token (later in flat order), so the groups MUST be decoded
            # together — exactly what decode_step_groups does
            rtg_rt_slot = eg(gather_members(rtg_rt, groups.members))
            n_rtg3 = tf.normalize_rtgs(rtg_rt_slot, wc) * model_exist[..., None]

            def fused(m):
                e_prev = m.encoder.embed_action_tokens(
                    carry.prev_action_ids, tprev_ids, a_ids,
                    carry.prev_exist[..., None],
                )
                e_rtg = m.encoder.embed_rtg_tokens(
                    n_rtg3, tcur_ids, a_ids, model_exist[..., None]
                )
                e_state = m.encoder.embed_state_tokens(
                    states12, n_goals, tcur_ids, a_ids, model_exist[..., None]
                )
                emb = m.encoder.embed_ln(
                    jnp.concatenate([e_prev, e_rtg, e_state], axis=1)
                )
                return m.decoder.decode_step_groups(
                    [
                        (emb[:, :Am], 2, t - 1),
                        (emb[:, Am : 2 * Am], 0, t),
                        (emb[:, 2 * Am :], 1, t),
                    ],
                    carry.cache, memory, memory_valid, window,
                    memory_kv=memory_kv,
                )

            x, cache = model.apply(params, method=fused)
            x_for_action = x[:, 2 * Am :]
            # decay AFTER this step's tokens were embedded: the next step's
            # rtg token carries the decayed value (policy_evaluator.py:146-149)
            rtg_rt = rtg_rt - dt_dense_reward3(cfg, scenario, env_state, reward8)
        elif cfg.eval.streaming_passes >= 3:
            # faithful sequential decode (the A/B control for the fused
            # action deferral): t-1 actions get their own pass BEFORE the
            # state slot overwrite, so their receptive field is the full
            # window — reference order at 1.5x cache traffic
            _, cache = model.apply(
                params,
                method=lambda m: m.stream_prev_action(
                    carry.prev_action_ids, carry.prev_exist, t, carry.cache,
                    memory, memory_valid, window, memory_kv=memory_kv,
                ),
            )
            x_state, cache = model.apply(
                params,
                method=lambda m: m.stream_state(
                    states12, n_goals, model_exist, t, cache, memory,
                    memory_valid, window, memory_kv=memory_kv,
                ),
            )
            if pc.predict_rtgs:
                rtg_logits = model.apply(
                    params, x_state, method=lambda m, x: m.rtg_head(x)
                ).reshape(E, G, Am, wc.rtg_discretization, 3)
                contrib = model_exist_g & group_alive[..., None]
                table_logits, covered = scatter_by_rank(
                    rtg_logits, groups.members, contrib, A
                )
                rtg_bins_ag = sample_tilted_rtgs(k_rtg, table_logits, agent_tilt)
                rtg_cont = tf.undiscretize_rtgs(rtg_bins_ag, wc) * covered[..., None]
                rtg_bins = eg(
                    gather_members(rtg_bins_ag, groups.members)
                ) * model_exist[..., None].astype(jnp.int32)
            else:
                rtg_bins = jnp.zeros((EG, Am, 3), jnp.int32)

            x_for_action, cache = model.apply(
                params,
                method=lambda m: m.stream_rtg(
                    rtg_bins, model_exist, t, cache, memory, memory_valid,
                    window, memory_kv=memory_kv,
                ),
            )
        else:
            # default CtRL-Sim: TWO passes — (prev action + state), then
            # (sampled rtg) whose output row feeds the action head
            x_state, cache = model.apply(
                params,
                method=lambda m: m.stream_action_state(
                    carry.prev_action_ids, carry.prev_exist, states12, n_goals,
                    model_exist, t, carry.cache, memory, memory_valid, window,
                    memory_kv=memory_kv, mask_override=mask1_t,
                ),
            )

            if pc.predict_rtgs:
                rtg_logits = model.apply(
                    params, x_state, method=lambda m, x: m.rtg_head(x)
                ).reshape(E, G, Am, wc.rtg_discretization, 3)
                # cross-group dedup: lowest-rank group's logits win, one
                # sample per agent, shared bins streamed into every cache
                contrib = model_exist_g & group_alive[..., None]
                table_logits, covered = scatter_by_rank(
                    rtg_logits, groups.members, contrib, A
                )
                rtg_bins_ag = sample_tilted_rtgs(k_rtg, table_logits, agent_tilt)
                rtg_cont = tf.undiscretize_rtgs(rtg_bins_ag, wc) * covered[..., None]
                rtg_bins = eg(
                    gather_members(rtg_bins_ag, groups.members)
                ) * model_exist[..., None].astype(jnp.int32)
            else:
                rtg_bins = jnp.zeros((EG, Am, 3), jnp.int32)

            x_for_action, cache = model.apply(
                params,
                method=lambda m: m.stream_rtg(
                    rtg_bins, model_exist, t, cache, memory, memory_valid,
                    window, memory_kv=memory_kv, mask_override=mask2_t,
                ),
            )

        logits = model.apply(
            params, x_for_action, method=lambda m, x: m.action_head(x)
        ).reshape((E, G, Am, -1))
        contrib = model_exist_g & group_alive[..., None] & groups.group_valid[..., None]
        table_action_logits, act_covered = scatter_by_rank(
            logits, groups.members, contrib, A
        )
        action_ids = sample_actions(
            k_act, table_action_logits, pc.action_temperature,
            pc.nucleus_sampling, pc.nucleus_threshold,
        )
        policy_actions = tf.undiscretize_actions(action_ids, wc)  # [E, A, 2]
        policy_actions = policy_actions * act_covered[..., None]

        # ---- applied actions (policy after history; GT replay otherwise) --
        gt_accel, gt_steer = inverse_bicycle_action(
            tp[:, :, t + 1], th[:, :, t + 1], ts[:, :, t + 1],
            env_state.bodies.position, env_state.bodies.heading,
            env_state.bodies.speed, length, cfg.sim.dt,
        )
        replay_valid = env_state.alive & tv[:, :, t] & tv[:, :, t + 1]
        gt_accel = jnp.where(replay_valid, gt_accel, 0.0)
        gt_steer = jnp.where(replay_valid, gt_steer, 0.0)
        use_policy = (
            controlled_mask & (t >= cfg.sim.history_steps - 1) & env_state.alive
        )
        accel = jnp.where(use_policy, policy_actions[..., 0], gt_accel)
        steer = jnp.where(use_policy, policy_actions[..., 1], gt_steer)

        # ---- applied action ids: written into each group's cache at the
        # START of the next step, fused with its state pass ------------------
        applied_ids_ag = tf.discretize_actions(
            jnp.stack([accel, steer], axis=-1), wc
        ).astype(jnp.int32)
        applied_ids = eg(gather_members(applied_ids_ag, groups.members))

        alive_next = env_state.alive & tv[:, :, t + 1]
        alive_next = alive_next & (use_policy | replay_valid)
        new_env_state, _ = env.step(
            scenario, env_state, accel, steer,
            expert_mask=jnp.zeros_like(alive_next), alive_next=alive_next,
        )

        nearest = jax.vmap(
            lambda pp, ee: tf.compute_dist_to_nearest_vehicle_rewards(
                pp[:, None, :], ee[:, None], normalize=False
            )[:, 0]
        )(env_state.bodies.position, env_state.alive.astype(jnp.float32))

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
        return Carry(
            new_env_state, cache, relevant, rng, applied_ids, model_exist,
            rtg_rt,
        ), ys

    carry0 = Carry(
        env_state0,
        cache0,
        relevant0,
        rng,
        jnp.zeros((EG, Am), jnp.int32),
        jnp.zeros((EG, Am), jnp.float32),
        rtg_rt0,
    )
    scan_xs = (
        (jnp.arange(steps), premask1, premask2)
        if use_premask
        else jnp.arange(steps)
    )
    final_carry, ys = jax.lax.scan(step_fn, carry0, scan_xs)
    (pos, vel, heading, speed, exist, reward8, accel, steer, nearest, rtgs) = ys

    final_reward8, final_env = env.reward(scenario, final_carry.env_state)
    app = lambda a, b: jnp.concatenate([a, b[None]], axis=0)
    nearest_final = jax.vmap(
        lambda pp, ee: tf.compute_dist_to_nearest_vehicle_rewards(
            pp[:, None, :], ee[:, None], normalize=False
        )[:, 0]
    )(final_env.bodies.position, final_env.alive.astype(jnp.float32))

    return RolloutOutput(
        position=app(pos, final_env.bodies.position),
        velocity=app(vel, final_env.bodies.velocity),
        heading=app(heading, final_env.bodies.heading),
        speed=app(speed, final_env.bodies.speed),
        existence=app(exist, final_env.alive.astype(jnp.float32)),
        reward8=app(reward8, final_reward8),
        acceleration=accel,
        steering=steer,
        nearest_dist=app(nearest, nearest_final),
        rtgs=rtgs,
        controlled_mask=controlled_mask,
    )
