"""Gym-style partially-observable rollout: the product consumer of
``WaymoEnv.observe``.

Nocturne's RL interface hands agents an ego-centric visible state each step
(scenario.cc:391-548 EgoState/FlattenedVisibleState through the
``nocturne.envs`` wrappers); CtRL-Sim itself consumes full states, so this
module is the TPU-native home of that API: a jitted scan that log-replays
every agent through physics and emits the fixed-shape observation stream an
RL consumer would train on — batched over scenes, one device pass, no
per-step host crossings.

Example
-------
    obs, traj = observation_replay(cfg, scenario, ego_index)
    obs["visible_objects"]  # [T, E, max_visible_objects, 13]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.data.scenario import Scenario
from ctrl_sim_tpu.env.dynamics import inverse_bicycle_action
from ctrl_sim_tpu.env.env import WaymoEnv

Array = jax.Array


def observation_replay(
    cfg: Config,
    scenario: Scenario,
    ego_index: Array,  # [E] int — ego agent per scene
    max_visible_objects: int = 16,
    max_visible_lights: int = 20,
    max_visible_road_points: int = 300,
    max_visible_stop_signs: int = 4,
    view_dist: float = 80.0,
    view_angle: float = float(jnp.pi) * (120.0 / 180.0),
) -> tuple[dict, dict]:
    """Replay GT actions through physics, observing through the ego cone.

    Returns ``(obs, traj)``:
      obs: dict of time-major streams — ``ego_state`` [T, E, 5],
        ``visible_mask`` [T, E, A], ``visible_objects``
        [T, E, max_visible_objects, 13], ``road_points``
        [T, E, max_visible_road_points, 13], ``traffic_lights``
        [T, E, max_visible_lights, 12], ``stop_signs``
        [T, E, max_visible_stop_signs, 3] (see WaymoEnv.observe).
      traj: ``position`` [T, E, A, 2], ``reward8`` [T, E, A, 8] — the
        underlying privileged stream, for reward shaping / debugging.
    """
    env = WaymoEnv(cfg)
    tp = jnp.asarray(scenario.traj_position)
    th = jnp.asarray(scenario.traj_heading)
    ts = jnp.asarray(scenario.traj_speed)
    tv = jnp.asarray(scenario.traj_valid)
    length = jnp.asarray(scenario.length)
    steps = cfg.sim.steps

    def step_fn(carry, t):
        env_state = carry
        reward8, env_state = env.reward(scenario, env_state)
        obs = env.observe(
            scenario, env_state, ego_index,
            max_visible_objects=max_visible_objects,
            max_visible_lights=max_visible_lights,
            max_visible_road_points=max_visible_road_points,
            max_visible_stop_signs=max_visible_stop_signs,
            view_dist=view_dist, view_angle=view_angle,
        )
        accel, steer = inverse_bicycle_action(
            tp[:, :, t + 1], th[:, :, t + 1], ts[:, :, t + 1],
            env_state.bodies.position, env_state.bodies.heading,
            env_state.bodies.speed, length, cfg.sim.dt,
        )
        valid = env_state.alive & tv[:, :, t] & tv[:, :, t + 1]
        accel = jnp.where(valid, accel, 0.0)
        steer = jnp.where(valid, steer, 0.0)
        new_state, _ = env.step(
            scenario, env_state, accel, steer,
            expert_mask=jnp.zeros_like(valid),
            alive_next=valid,
        )
        ys = (obs, env_state.bodies.position, reward8)
        return new_state, ys

    state0 = env.reset(scenario)
    _, (obs, position, reward8) = jax.lax.scan(
        step_fn, state0, jnp.arange(steps)
    )
    return obs, {"position": position, "reward8": reward8}
