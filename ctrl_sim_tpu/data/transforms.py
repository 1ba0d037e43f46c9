"""Training/rollout data transforms as pure JAX functions.

Port of the RLWaymoDataset transform stack (datasets/rl_waymo/dataset.py),
shared by the trainer, the dataset pipeline and the rollout policy — the
reference reuses ``dset.*`` from policies the same way, and that single source
of truth is preserved here.

Unlike the reference (numpy per sample inside 6 dataloader worker processes),
these run under ``vmap``/``jit`` on device: the whole batch's reward
aggregation, RTG reverse-cumsum, SE(2) normalization and discretization are a
few fused kernels per training step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ctrl_sim_tpu.config import WaymoDatasetConfig
from ctrl_sim_tpu.geometry import angle_sub, apply_se2

Array = jax.Array

# reward component indices (dataset.py:23-39)
POS_TARGET_ACHIEVED = 0
HEADING_TARGET_ACHIEVED = 1
SPEED_TARGET_ACHIEVED = 2
POS_GOAL_SHAPED = 3
SPEED_GOAL_SHAPED = 4
HEADING_GOAL_SHAPED = 5
VEH_VEH_COLLISION = 6
VEH_EDGE_COLLISION = 7


# ---------------------------------------------------------------------------
# Reward aggregation -> 5 components -> RTGs
# ---------------------------------------------------------------------------


def compute_dist_to_nearest_vehicle_rewards(
    positions: Array,  # [A, T, 2]
    existence: Array,  # [A, T]
    max_dist: float = 15.0,
    normalize: bool = True,
) -> Array:
    """Min distance to any other existing vehicle, clipped/normalized
    (dataset.py:202-237). Missing timesteps -> 0."""
    inf = jnp.asarray(jnp.inf, dtype=positions.dtype)
    masked = jnp.where(existence[..., None].astype(bool), positions, inf)
    diff = masked[:, None] - masked[None, :]  # [A, A, T, 2]
    sq = jnp.sum(diff * diff, axis=-1)  # [A, A, T]
    num_agents = positions.shape[0]
    eye = jnp.eye(num_agents, dtype=bool)[:, :, None]
    sq = jnp.where(eye, inf, sq)
    nearest = jnp.sqrt(jnp.min(sq, axis=1))  # [A, T]
    nearest = jnp.where(jnp.isinf(nearest), jnp.nan, nearest)
    if normalize:
        nearest = jnp.clip(nearest * existence, 0.0, max_dist) / max_dist
    else:
        nearest = nearest * existence
    return jnp.nan_to_num(nearest, nan=0.0)


def compute_rewards5(
    existence: Array,  # [A, T]
    rewards8: Array,  # [A, T, 8]
    veh_edge_dist_rewards: Array,  # [A, T] — (-signed_dist / 15), existence-masked
    veh_veh_dist_rewards: Array,  # [A, T] — normalized nearest distance
    cfg: WaymoDatasetConfig,
) -> Array:
    """Aggregate the 8-vector into the 5 training reward components
    (dataset.py:240-275):

      [0] goal-position  (achieved x10 [+ clipped shaped])
      [1] goal-heading
      [2] goal-speed
      [3] veh-veh        (shaped distance - 10 x collision)
      [4] veh-edge       (clip(|dist|*15, 0, 5)/5 - 10 x collision)
    """
    ex = existence[..., None]
    r = rewards8

    if cfg.remove_shaped_goal:
        goal_pos = r[..., POS_TARGET_ACHIEVED] * cfg.pos_target_achieved_rew_multiplier
    else:
        goal_pos = r[..., POS_TARGET_ACHIEVED] * cfg.pos_target_achieved_rew_multiplier + (
            jnp.clip(r[..., POS_GOAL_SHAPED], cfg.pos_goal_shaped_min, cfg.pos_goal_shaped_max)
            - cfg.pos_goal_shaped_max
        ) * (1.0 / cfg.pos_goal_shaped_max)
    goal_heading = r[..., HEADING_TARGET_ACHIEVED] + r[..., HEADING_GOAL_SHAPED]
    goal_speed = r[..., SPEED_TARGET_ACHIEVED] + r[..., SPEED_GOAL_SHAPED]

    if cfg.remove_shaped_veh_reward:
        veh_veh = -r[..., VEH_VEH_COLLISION] * cfg.veh_veh_collision_rew_multiplier
    else:
        veh_veh = (
            veh_veh_dist_rewards
            - r[..., VEH_VEH_COLLISION] * cfg.veh_veh_collision_rew_multiplier
        )
    if cfg.remove_shaped_edge_reward:
        veh_edge = -r[..., VEH_EDGE_COLLISION] * cfg.veh_edge_collision_rew_multiplier
    else:
        veh_edge = (
            jnp.clip(
                jnp.abs(veh_edge_dist_rewards) * cfg.dist_to_road_edge_scaling_factor,
                0.0,
                5.0,
            )
            / 5.0
            - r[..., VEH_EDGE_COLLISION] * cfg.veh_edge_collision_rew_multiplier
        )

    stacked = jnp.stack([goal_pos, goal_heading, goal_speed, veh_veh, veh_edge], axis=-1)
    return stacked * ex


def reverse_cumsum_rtg(rewards5: Array) -> Array:
    """Return-to-go: reversed cumulative sum over time
    (dataset_ctrl_sim.py:94). rewards5 [A, T, C] -> [A, T, C]."""
    return jnp.flip(jnp.cumsum(jnp.flip(rewards5, axis=1), axis=1), axis=1)


def select_rtg_components(rtgs5: Array) -> Array:
    """Keep [goal-pos, veh-veh, veh-edge] (dataset_ctrl_sim.py:99)."""
    return jnp.concatenate([rtgs5[..., :1], rtgs5[..., 3:5]], axis=-1)


def normalize_rtgs(rtgs3: Array, cfg: WaymoDatasetConfig) -> Array:
    """Clip + min-max normalize each component to [0, 1]
    (dataset_ctrl_sim.py:100-105 / autoregressive_policy.py:73-78)."""
    lo = jnp.asarray([cfg.min_rtg_pos, cfg.min_rtg_veh, cfg.min_rtg_road])
    hi = jnp.asarray([cfg.max_rtg_pos, cfg.max_rtg_veh, cfg.max_rtg_road])
    return (jnp.clip(rtgs3, lo, hi) - lo) / (hi - lo)


# ---------------------------------------------------------------------------
# Action / RTG discretization
# ---------------------------------------------------------------------------


def discretize_actions(actions: Array, cfg: WaymoDatasetConfig) -> Array:
    """(accel, steer) -> single categorical in [0, 1000)
    (dataset.py:365-379). actions [..., 2] -> [...] float of integer value."""
    accel = (jnp.clip(actions[..., 0], cfg.min_accel, cfg.max_accel) - cfg.min_accel) / (
        cfg.max_accel - cfg.min_accel
    )
    steer = (jnp.clip(actions[..., 1], cfg.min_steer, cfg.max_steer) - cfg.min_steer) / (
        cfg.max_steer - cfg.min_steer
    )
    accel = jnp.round(accel * (cfg.accel_discretization - 1))
    steer = jnp.round(steer * (cfg.steer_discretization - 1))
    return accel * cfg.steer_discretization + steer


def undiscretize_actions(actions: Array, cfg: WaymoDatasetConfig) -> Array:
    """Categorical -> continuous (accel, steer) (dataset.py:322-339)."""
    accel = jnp.floor_divide(actions, cfg.steer_discretization).astype(jnp.float32)
    steer = jnp.mod(actions, cfg.steer_discretization).astype(jnp.float32)
    accel = accel / (cfg.accel_discretization - 1)
    steer = steer / (cfg.steer_discretization - 1)
    accel = accel * (cfg.max_accel - cfg.min_accel) + cfg.min_accel
    steer = steer * (cfg.max_steer - cfg.min_steer) + cfg.min_steer
    return jnp.stack([accel, steer], axis=-1)


def discretize_rtgs(rtgs: Array, cfg: WaymoDatasetConfig) -> Array:
    """Normalized [0,1] RTGs -> bin indices (dataset.py:382-387)."""
    return jnp.round(rtgs * (cfg.rtg_discretization - 1))


def undiscretize_rtgs(rtgs: Array, cfg: WaymoDatasetConfig) -> Array:
    """Bin indices -> continuous RTG values (dataset.py:351-362)."""
    lo = jnp.asarray([cfg.min_rtg_pos, cfg.min_rtg_veh, cfg.min_rtg_road])
    hi = jnp.asarray([cfg.max_rtg_pos, cfg.max_rtg_veh, cfg.max_rtg_road])
    frac = rtgs.astype(jnp.float32) / (cfg.rtg_discretization - 1)
    return frac * (hi - lo) + lo


def get_tilt_logits(
    goal_tilt: Array, veh_tilt: Array, road_tilt: Array, cfg: WaymoDatasetConfig
) -> Array:
    """Exponential-tilting logits per RTG bin (dataset.py:342-348):
    tilt * linspace(0, 1, num_bins) per component -> [num_bins, 3]."""
    ramp = jnp.linspace(0.0, 1.0, cfg.rtg_discretization)
    return jnp.stack(
        [goal_tilt * ramp, veh_tilt * ramp, road_tilt * ramp], axis=-1
    )


# ---------------------------------------------------------------------------
# Relevant-agent selection (fixed-shape re-formulation)
# ---------------------------------------------------------------------------


class SelectedAgents(NamedTuple):
    gather_idx: Array  # [max_num_agents] int — source agent per output slot
    slot_valid: Array  # [max_num_agents] bool — slot holds a selected agent
    new_origin_idx: Array  # int — origin agent's output slot


def select_relevant_agents_idx(
    agent_positions_t: Array,  # [A, 2] at the window-anchor timestep
    agent_valid: Array,  # [A] bool — real (non-padding) agents
    origin_agent_idx: Array,  # int
    cfg: WaymoDatasetConfig,
    shuffle_key: Array | None = None,
    keep_mask: Array | None = None,  # [A] bool — sticky relevant set (eval)
) -> SelectedAgents:
    """Fixed-shape version of select_relevant_agents (dataset.py:278-319).

    Keeps the <=24 agents nearest to the origin agent within 60 m. In
    training, the kept set is randomly shuffled (so slots are not
    distance-ordered); in eval, ``keep_mask`` holds the sticky relevant set
    which is intersected with the 60 m validity region (agents leaving the
    radius are dropped and never re-added, autoregressive_policy.py:129-137).

    Returns gather indices + a slot-validity mask, so callers build the padded
    [24, ...] tensors with one ``take`` per field.
    """
    A = agent_positions_t.shape[0]
    K = cfg.max_num_agents
    origin = agent_positions_t[origin_agent_idx]
    dist = jnp.linalg.norm(agent_positions_t - origin[None, :], axis=-1)
    in_range = (dist < cfg.agent_dist_threshold) & agent_valid
    if keep_mask is not None:
        in_range = in_range & keep_mask

    # sort by distance, invalid pushed to the end
    sort_key = jnp.where(in_range, dist, jnp.inf)
    order = jnp.argsort(sort_key)  # [A]
    top = order[:K]
    top_valid = jnp.take(in_range, top)

    if shuffle_key is not None:
        # shuffle only the valid prefix: permute positions among valid slots
        perm = jax.random.permutation(shuffle_key, K)
        # stable trick: move valid entries through the permutation, keeping
        # invalid ones at the back
        keyed = jnp.where(jnp.take(top_valid, perm), perm, K + perm)
        reorder = jnp.argsort(keyed)
        top = jnp.take(top, jnp.take(perm, reorder))
        top_valid = jnp.take(top_valid, jnp.take(perm, reorder))

    new_origin = jnp.argmax(top == origin_agent_idx)
    return SelectedAgents(gather_idx=top, slot_valid=top_valid, new_origin_idx=new_origin)


def gather_agents(arr: Array, sel: SelectedAgents) -> Array:
    """Gather per-agent leading-axis data into the 24 selected slots, zeroing
    invalid slots (matching the zero-initialized buffers of dataset.py:283-288)."""
    out = jnp.take(arr, sel.gather_idx, axis=0)
    mask_shape = (len(sel.slot_valid),) + (1,) * (out.ndim - 1)
    return out * sel.slot_valid.reshape(mask_shape).astype(out.dtype)


# ---------------------------------------------------------------------------
# Scene normalization
# ---------------------------------------------------------------------------


class NormalizedScene(NamedTuple):
    agent_states: Array  # [K, T, 8]
    road_points: Array  # [P, L, 3]
    road_types: Array  # [P, 8]
    goals: Array  # [K, goal_dim]


def normalize_scene(
    agent_states: Array,  # [K, T, 8] (x, y, vx, vy, yaw, L, W, existence)
    road_points: Array,  # [P, L, 3]
    road_types: Array,  # [P, 8]
    road_valid: Array,  # [P] bool
    goals: Array,  # [K, 5]
    origin_agent_idx: Array,  # int — slot of origin agent
    cfg: WaymoDatasetConfig,
    anchor_pose: Array | None = None,  # [3] (x, y, yaw) explicit frame anchor
) -> NormalizedScene:
    """SE(2)-normalize the scene to the origin agent at the window start,
    rotating its heading to +pi/2, and keep the <=200 closest polylines
    (dataset.py:390-428).

    Fixed-shape: when there are fewer polylines than the cap the reference
    zero-pads; we always select the 200 smallest-distance rows, with invalid
    rows given infinite distance — identical result, no dynamic shapes.

    ``anchor_pose`` overrides the frame anchor (default: the origin agent's
    pose at the window start) — used by episode_start_normalization to pin
    the frame at the origin's EPISODE-start pose, matching the streaming
    rollout's fixed per-episode frame.
    """
    if anchor_pose is None:
        yaw = agent_states[origin_agent_idx, 0, 4]
        translation = agent_states[origin_agent_idx, 0, :2]
    else:
        yaw = anchor_pose[2]
        translation = anchor_pose[:2]
    angle_of_rotation = (jnp.pi / 2) + jnp.sign(-yaw) * jnp.abs(yaw)

    pos = apply_se2(agent_states[..., :2], translation, angle_of_rotation)
    vel = apply_se2(agent_states[..., 2:4], jnp.zeros(2), angle_of_rotation)
    heading = angle_sub(agent_states[..., 4], -angle_of_rotation)
    agent_states = jnp.concatenate(
        [pos, vel, heading[..., None], agent_states[..., 5:]], axis=-1
    )

    goal_pos = apply_se2(goals[..., :2], translation, angle_of_rotation)
    goal_vel = apply_se2(goals[..., 2:4], jnp.zeros(2), angle_of_rotation)
    goal_heading = angle_sub(goals[..., 4], -angle_of_rotation)
    goals = jnp.concatenate([goal_pos, goal_vel, goal_heading[..., None]], axis=-1)

    rp = road_points.at[..., :2].set(
        apply_se2(road_points[..., :2], translation, angle_of_rotation)
    )
    # keep the polylines whose farthest valid point is nearest to the origin
    P = rp.shape[0]
    cap = cfg.max_num_road_polylines
    max_dist = jnp.max(
        jnp.linalg.norm(rp[..., :2], axis=-1) * rp[..., -1], axis=1
    )  # [P]
    max_dist = jnp.where(road_valid, max_dist, jnp.inf)
    if P > cap:
        keep = jnp.argsort(max_dist)[:cap]
        rp = jnp.take(rp, keep, axis=0)
        rt = jnp.take(road_types, keep, axis=0)
        kept_valid = jnp.take(road_valid, keep)
    else:
        rt = road_types
        kept_valid = road_valid
    # invalid rows: zero points, -1 types (dataset.py:423-426)
    rp = rp * kept_valid[:, None, None].astype(rp.dtype)
    rt = jnp.where(kept_valid[:, None], rt, -1.0)
    return NormalizedScene(agent_states=agent_states, road_points=rp, road_types=rt, goals=goals)
