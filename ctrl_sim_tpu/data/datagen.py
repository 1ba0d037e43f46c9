"""Offline-RL dataset generation: batched replay-through-physics.

TPU-native equivalent of data/generate_offline_rl_dataset.py: every vehicle
is physics-simulated and driven by inverse-bicycle actions re-derived each
step from the simulated (drifting) state toward the GT next state
(reference :88-119); per-step states, actions and 8-component rewards are
recorded. The reference runs one scene per Python process step-by-step
through pybind; here the whole scenario batch rolls out in one
``lax.scan`` under ``jit``.

Also computes the two distance-shaped reward streams the preprocessed
pickles carry (dataset.py:189-237): signed distance to the nearest road
edge and distance to the nearest vehicle.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.data.scenario import Scenario
from ctrl_sim_tpu.data.transforms import compute_dist_to_nearest_vehicle_rewards
from ctrl_sim_tpu.env.dynamics import inverse_bicycle_action
from ctrl_sim_tpu.env.env import WaymoEnv
from ctrl_sim_tpu.geometry import signed_distance_to_polylines

Array = jax.Array


class OfflineArrays(NamedTuple):
    """Recorded replay streams, the array equivalent of the *_physics.json +
    preprocessed pickle pair."""

    states: Array  # [E, A, T, 8] (x, y, vx, vy, yaw, L, W, existence)
    actions: Array  # [E, A, T, 2] (accel, steer)
    rewards8: Array  # [E, A, T, 8]
    veh_edge_dist_rewards: Array  # [E, A, T] (-signed_dist/15, existence-masked)
    veh_veh_dist_rewards: Array  # [E, A, T] (normalized nearest distance)


def generate_offline_data(cfg: Config, scenario: Scenario) -> OfflineArrays:
    """Replay a scenario batch through physics and record everything."""
    env = WaymoEnv(cfg)
    steps = cfg.sim.steps
    tp = jnp.asarray(scenario.traj_position)
    th = jnp.asarray(scenario.traj_heading)
    ts = jnp.asarray(scenario.traj_speed)
    tv = jnp.asarray(scenario.traj_valid)
    length = jnp.asarray(scenario.length)
    width = jnp.asarray(scenario.width)

    state0 = env.reset(scenario)

    def step_fn(state, t):
        # inverse-bicycle action from the *simulated* state toward GT next
        accel, steer = inverse_bicycle_action(
            tp[:, :, t + 1], th[:, :, t + 1], ts[:, :, t + 1],
            state.bodies.position, state.bodies.heading, state.bodies.speed,
            length, cfg.sim.dt,
        )
        # action valid iff GT exists at t and t+1 and the chain is unbroken
        act_valid = state.alive & tv[:, :, t] & tv[:, :, t + 1]
        accel = jnp.where(act_valid, accel, 0.0)
        steer = jnp.where(act_valid, steer, 0.0)

        reward8, state = env.reward(scenario, state)

        # record the pre-step state in the dataset convention
        velocity = state.bodies.speed[..., None] * jnp.stack(
            [jnp.cos(state.bodies.heading), jnp.sin(state.bodies.heading)],
            axis=-1,
        )
        recorded = jnp.concatenate(
            [
                state.bodies.position,
                velocity,
                state.bodies.heading[..., None],
                jnp.broadcast_to(length[..., None], state.bodies.heading.shape + (1,)),
                jnp.broadcast_to(width[..., None], state.bodies.heading.shape + (1,)),
                act_valid[..., None].astype(tp.dtype),
            ],
            axis=-1,
        )  # [E, A, 8]

        next_state, _ = env.step(
            scenario,
            state,
            accel,
            steer,
            expert_mask=jnp.zeros_like(act_valid),
            alive_next=act_valid,
        )
        return next_state, (recorded, jnp.stack([accel, steer], axis=-1), reward8)

    _, (states, actions, rewards8) = jax.lax.scan(
        step_fn, state0, jnp.arange(steps)
    )
    # scan stacks time first: [T, E, A, ...] -> [E, A, T, ...]
    states = jnp.moveaxis(states, 0, 2)
    actions = jnp.moveaxis(actions, 0, 2)
    rewards8 = jnp.moveaxis(rewards8, 0, 2)

    existence = states[..., -1]

    # distance-shaped reward streams (dataset.py:189-237)
    def edge_dist_one(positions, ex, polylines, valids):
        flat = positions.reshape(-1, 2)  # [A*T, 2]
        d = signed_distance_to_polylines(flat, polylines, valids)
        d = d.reshape(positions.shape[:2])
        return (-d / cfg.waymo.dist_to_road_edge_scaling_factor) * ex

    veh_edge = jax.vmap(edge_dist_one)(
        states[..., :2],
        existence,
        jnp.asarray(scenario.edge_polylines),
        jnp.asarray(scenario.edge_poly_valid),
    )
    veh_veh = jax.vmap(
        lambda p, e: compute_dist_to_nearest_vehicle_rewards(
            p, e, cfg.waymo.max_veh_veh_distance
        )
    )(states[..., :2], existence)
    # the reference masks both streams by existence once more
    # (dataset_ctrl_sim.py:61-62)
    veh_edge = veh_edge * existence
    veh_veh = veh_veh * existence

    return OfflineArrays(
        states=states,
        actions=actions,
        rewards8=rewards8,
        veh_edge_dist_rewards=veh_edge,
        veh_veh_dist_rewards=veh_veh,
    )
