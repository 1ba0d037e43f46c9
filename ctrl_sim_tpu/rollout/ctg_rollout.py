"""CTG++ closed-loop rollout (reference: policies/ctg_plus_plus_policy.py).

The diffusion policy plans at ``sampling_frequency`` (2 Hz -> every 5 env
steps, policy_evaluator.py:511-527): at each planning step it builds the
past-horizon conditioning from the live rollout buffers (per-agent local
frames, relative encodings, per-agent road crops — the same transforms as
the CTG++ training pipeline), samples a joint [state || action] future with
the strided DDPM sampler, and fills a 5-step action buffer that ``act``
consumes between plans (:220-252). Uncontrolled agents log-replay through
physics.

Everything, including the 50-step denoising loop at each replan, runs
inside the jitted 90-step scan (replanning is a ``lax.cond``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.data import transforms as tf
from ctrl_sim_tpu.data.ctg_pipeline import (
    agents_local_frame,
    goals_local_frame,
    relative_encodings,
    roads_local_frame,
    select_agent_roads,
)
from ctrl_sim_tpu.data.pipeline import goals_from_scenario
from ctrl_sim_tpu.data.scenario import Scenario
from ctrl_sim_tpu.env.dynamics import inverse_bicycle_action
from ctrl_sim_tpu.env.env import EnvState, WaymoEnv
from ctrl_sim_tpu.rollout.rollout import (
    RolloutOutput,
    _nearest_dist,
    _recorded_state,
)

Array = jax.Array


def _unnormalize_actions(a: Array, wc) -> Array:
    """[-1, 1] -> (accel, steer) (dataset_ctg_plus_plus.py:242-247)."""
    a = (a + 1.0) / 2.0
    accel = a[..., 0] * (wc.max_accel - wc.min_accel) + wc.min_accel
    steer = a[..., 1] * (wc.max_steer - wc.min_steer) + wc.min_steer
    return jnp.stack([accel, steer], axis=-1)


def run_ctg_closed_loop(
    cfg: Config,
    model,  # CTGPlusPlus flax module
    params,
    scenario: Scenario,
    controlled_mask: Array,  # [E, A]
    rng: Array,
) -> RolloutOutput:
    wc = cfg.waymo
    env = WaymoEnv(cfg)
    steps = cfg.sim.steps
    T_in = wc.input_horizon
    A = wc.max_num_agents
    replan_every = T_in // 2  # 2 Hz at dt=0.1 with input_horizon 10 -> 5

    tp = jnp.asarray(scenario.traj_position)
    th = jnp.asarray(scenario.traj_heading)
    ts = jnp.asarray(scenario.traj_speed)
    tv = jnp.asarray(scenario.traj_valid)
    length = jnp.asarray(scenario.length)
    width = jnp.asarray(scenario.width)
    E = tp.shape[0]
    if tp.shape[1] != A:
        raise ValueError("lanes must have exactly max_num_agents slots")

    goals5 = goals_from_scenario(scenario)
    types = jax.nn.one_hot(jnp.asarray(scenario.agent_type), wc.num_agent_types)
    env_state0 = env.reset(scenario)

    class Carry(NamedTuple):
        env_state: EnvState
        states_buf: Array  # [E, A, S+1, 8]
        actions_buf: Array  # [E, A, S+1, 2]
        plan_buf: Array  # [E, A, T_out, 2] continuous planned actions
        plan_step: Array  # scalar int32 — step of last replan
        rng: Array

    def build_cond(carry: Carry, t: Array) -> dict:
        """Past-horizon conditioning from the live buffers (one lane batch)."""
        w0 = jnp.maximum(t - (T_in - 1), 0)
        past = jax.lax.dynamic_slice_in_dim(carry.states_buf, w0, T_in, axis=2)
        past_actions = jax.lax.dynamic_slice_in_dim(
            carry.actions_buf, w0, T_in, axis=2
        )

        def per_lane(past_l, past_a_l, goals_l, types_l, rp_l, rt_l, rv_l):
            anchor = past_l[:, -1]
            rp, rt = select_agent_roads(
                anchor[:, :2], (anchor[:, -1] > 0).astype(jnp.float32),
                rp_l, rt_l, rv_l, wc.max_num_road_polylines,
            )
            past13 = agents_local_frame(past_l, anchor)
            rp = roads_local_frame(rp, anchor)
            n_goals = goals_local_frame(goals_l, anchor)
            present13 = past13[:, -1]
            past_rel = relative_encodings(past13, present13)
            future_rel = jnp.broadcast_to(
                past_rel[:, :, -1:, :],
                past_rel.shape[:2] + (wc.train_context_length - T_in, 7),
            )
            past8 = jnp.concatenate([past13[..., 0:5], past13[..., 10:]], axis=-1)
            past8 = past8.at[..., :2].divide(wc.pos_div).at[..., 2:4].divide(wc.vel_div)
            n_goals = n_goals.at[..., :2].divide(wc.pos_div).at[..., 2:4].divide(wc.vel_div)
            rp = rp.at[..., :2].divide(wc.pos_div)
            return past8, past_rel, future_rel, rp, rt, n_goals, anchor

        past8, past_rel, future_rel, rp, rt, n_goals, anchor = jax.vmap(per_lane)(
            past, past_actions, goals5, types,
            jnp.asarray(scenario.road_points),
            jnp.asarray(scenario.road_types),
            jnp.asarray(scenario.road_valid),
        )

        def norm_actions(a):
            accel = (jnp.clip(a[..., 0], wc.min_accel, wc.max_accel) - wc.min_accel) / (
                wc.max_accel - wc.min_accel
            )
            steer = (jnp.clip(a[..., 1], wc.min_steer, wc.max_steer) - wc.min_steer) / (
                wc.max_steer - wc.min_steer
            )
            return 2.0 * jnp.stack([accel, steer], axis=-1) - 1.0

        return {
            "agent_past_states": past8,
            "agent_past_actions": norm_actions(past_actions),
            "past_relative_encodings": past_rel,
            "future_relative_encodings": future_rel,
            "agent_types": types,
            "goals": n_goals,
            "timesteps": jnp.broadcast_to(
                jnp.minimum(t, wc.max_timestep - 1)[None],
                (E, wc.train_context_length),
            ).astype(jnp.int32),
            "rtgs": jnp.zeros((E, A, T_in, 3), jnp.int32),
            "road_points": rp,
            "road_types": rt,
            "moving_agent_mask": jnp.ones((E, A)),
        }, anchor

    def replan(carry: Carry, t: Array) -> tuple[Array, Array]:
        cond, anchor = build_cond(carry, t)
        k = jax.random.fold_in(carry.rng, t)
        # optional diffusion guidance (the reference's dead
        # diffusion_guidance import, made real — models/ctg/guidance.py)
        pc = cfg.policy
        guidance_fn = None
        guides = []
        if pc.ctg_goal_guidance > 0.0:
            from ctrl_sim_tpu.models.ctg.guidance import goal_guide

            guides.append(goal_guide(pc.ctg_goal_guidance))
        if pc.ctg_collision_guidance > 0.0:
            from ctrl_sim_tpu.models.ctg.guidance import collision_guide

            guides.append(
                collision_guide(
                    anchor, wc.pos_div,
                    radius=pc.ctg_collision_radius,
                    weight=pc.ctg_collision_guidance,
                )
            )
        if guides:
            from ctrl_sim_tpu.models.ctg.guidance import combine

            guidance_fn = combine(*guides)
        samples = model.apply(
            params, cond, k, method=type(model).sample_from_cond,
            guidance_fn=guidance_fn,
        )  # [E, A, T_out, 7]
        tgt_k = wc.k_attr - 2
        return _unnormalize_actions(samples[..., tgt_k:], wc)

    def step_fn(carry: Carry, t: Array):
        env_state = carry.env_state
        rng, _ = jax.random.split(carry.rng)

        reward8, env_state = env.reward(scenario, env_state)
        rec = _recorded_state(env_state, length, width)
        states_buf = jax.lax.dynamic_update_slice_in_dim(
            carry.states_buf, rec[:, :, None, :], t, axis=2
        )
        carry = carry._replace(states_buf=states_buf, env_state=env_state)

        # replan at the reference's sampling steps: t in {9, 14, 19, ...}
        is_plan_step = (t >= cfg.sim.history_steps - 1) & (
            jnp.mod(t - (cfg.sim.history_steps - 1), replan_every) == 0
        )
        plan_buf, plan_step = jax.lax.cond(
            is_plan_step,
            lambda: (replan(carry, t), t),
            lambda: (carry.plan_buf, carry.plan_step),
        )

        offset = jnp.clip(t - plan_step, 0, plan_buf.shape[2] - 1)
        planned = jax.lax.dynamic_index_in_dim(
            plan_buf, offset, axis=2, keepdims=False
        )  # [E, A, 2]

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
        accel = jnp.where(use_policy, planned[..., 0], gt_accel)
        steer = jnp.where(use_policy, planned[..., 1], gt_steer)

        alive_next = env_state.alive & tv[:, :, t + 1]
        alive_next = alive_next & (use_policy | replay_valid)
        new_env_state, _ = env.step(
            scenario, env_state, accel, steer,
            expert_mask=jnp.zeros_like(alive_next), alive_next=alive_next,
        )

        applied = jnp.stack([accel, steer], axis=-1)
        actions_buf = jax.lax.dynamic_update_slice_in_dim(
            carry.actions_buf, applied[:, :, None, :], t, axis=2
        )
        nearest = _nearest_dist(
            env_state.bodies.position, env_state.alive.astype(jnp.float32)
        )
        ys = (
            env_state.bodies.position, env_state.bodies.velocity,
            env_state.bodies.heading, env_state.bodies.speed,
            env_state.alive.astype(jnp.float32), reward8, accel, steer,
            nearest, jnp.zeros((E, A, 3)),
        )
        return Carry(new_env_state, states_buf, actions_buf, plan_buf, plan_step, rng), ys

    T_out = wc.train_context_length - T_in
    carry0 = Carry(
        env_state=env_state0,
        states_buf=jnp.zeros((E, A, steps + 1, 8)),
        actions_buf=jnp.zeros((E, A, steps + 1, 2)),
        plan_buf=jnp.zeros((E, A, T_out, 2)),
        plan_step=jnp.asarray(0, jnp.int32),
        rng=rng,
    )
    final_carry, ys = jax.lax.scan(step_fn, carry0, jnp.arange(steps))
    (pos, vel, heading, speed, exist, reward8, accel, steer, nearest, rtgs) = ys

    final_reward8, final_env = env.reward(scenario, final_carry.env_state)
    app = lambda a, b: jnp.concatenate([a, b[None]], axis=0)
    nearest_final = _nearest_dist(
        final_env.bodies.position, final_env.alive.astype(jnp.float32)
    )
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
