"""Per-step reward computation.

Vectorized port of ``compute_reward`` (utils/sim.py:83-141) with the
``collision_fix=True`` split collision flags. Produces the same 8-component
reward vector the offline-RL dataset records per agent per step:

  [0] position target achieved (sticky once achieved)
  [1] heading target achieved
  [2] speed target achieved
  [3] shaped position-goal reward
  [4] shaped speed-goal reward
  [5] shaped heading-goal reward
  [6] vehicle-vehicle collision flag
  [7] vehicle-road-edge collision flag

The 5-component training reward aggregation (goal-pos / heading / speed /
veh-veh / veh-edge with distance shaping) lives in
``ctrl_sim_tpu.data.transforms`` — mirroring how the reference splits
utils/sim.py vs datasets/rl_waymo/dataset.py:240-275.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctrl_sim_tpu.config import RewardConfig
from ctrl_sim_tpu.geometry import angle_sub

Array = jax.Array


def compute_reward8(
    position: Array,  # [..., 2]
    speed: Array,  # [...]
    heading: Array,  # [...]
    goal_position: Array,  # [..., 2]
    goal_speed: Array,  # [...]
    goal_heading: Array,  # [...]
    goal_dist_normalizer: Array,  # [...]
    prev_position_achieved: Array,  # [...] bool — sticky goal flag
    veh_veh_collision: Array,  # [...] bool
    veh_edge_collision: Array,  # [...] bool
    cfg: RewardConfig = RewardConfig(),
) -> tuple[Array, Array]:
    """Returns (reward8 [..., 8], new_position_achieved [...])."""
    dist_to_goal = jnp.linalg.norm(goal_position - position, axis=-1)

    position_achieved = jnp.where(
        prev_position_achieved,
        True,
        dist_to_goal < cfg.position_target_tolerance,
    )
    speed_achieved = jnp.abs(goal_speed - speed) < cfg.speed_target_tolerance
    heading_achieved = (
        jnp.abs(angle_sub(goal_heading, heading)) < cfg.heading_target_tolerance
    )

    scaling = cfg.shaped_goal_distance_scaling
    rs = cfg.reward_scaling
    normalizer = jnp.where(goal_dist_normalizer == 0.0, 1.0, goal_dist_normalizer)
    pos_goal_rew = jnp.where(
        prev_position_achieved,
        scaling / rs,
        scaling * (1.0 - dist_to_goal / normalizer) / rs,
    )
    speed_goal_rew = scaling * (1.0 - jnp.abs(speed - goal_speed) / 40.0) / rs
    heading_goal_rew = (
        scaling
        * (1.0 - jnp.abs(angle_sub(heading, goal_heading)) / (2.0 * jnp.pi))
        / rs
    )
    if not (cfg.shaped_goal_distance and cfg.position_target):
        pos_goal_rew = jnp.zeros_like(pos_goal_rew)
        speed_goal_rew = jnp.zeros_like(speed_goal_rew)
        heading_goal_rew = jnp.zeros_like(heading_goal_rew)

    f = lambda x: x.astype(position.dtype)
    reward8 = jnp.stack(
        [
            f(position_achieved),
            f(heading_achieved),
            f(speed_achieved),
            pos_goal_rew,
            speed_goal_rew,
            heading_goal_rew,
            f(veh_veh_collision),
            f(veh_edge_collision),
        ],
        axis=-1,
    )
    return reward8, position_achieved
