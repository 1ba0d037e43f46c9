"""Ego-centric observation extraction: the Nocturne visible-state API.

Vectorized port of the reference's view-field + visible-state machinery:

- ``visible_objects_mask``: circular-sector visibility with sight-blocking
  occluders (nocturne/cpp/src/view_field.cc FilterVisibleObjects /
  scenario.cc:333-389 VisibleObjects) — an object is visible when inside the
  ego's view cone (radius + half-angle around heading) and not fully
  occluded by a nearer object's bounding box. The C++ checks occlusion by
  sampling sight rays to the target's corners; here a target is occluded
  when every corner's sight segment crosses some blocking OBB.
- ``ego_state``: [speed, dist_to_goal, rel_goal_heading, length, width]
  (scenario.cc:391-416 EgoState).
- ``flattened_visible_state``: fixed-size nearest-K visible-object features
  in the ego frame (scenario.cc:418-548 VisibleState/FlattenedVisibleState:
  per object [valid, dist, azimuth, length, width, rel_heading,
  rel_velocity_heading, rel_speed]).

CtRL-Sim's own pipeline does not consume these (it builds features from the
dataset arrays), but they complete the simulator's observation surface for
partially-observable RL uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctrl_sim_tpu.geometry import (
    angle_sub,
    normalize_angle,
    obb_corners,
    obb_segment_intersects,
)

Array = jax.Array


def _segment_blocked(p0: Array, p1: Array, blocker_corners: Array) -> Array:
    """True when segment p0->p1 intersects the blocker OBB.
    p0, p1: [..., 2]; blocker_corners: [..., 4, 2]."""
    return obb_segment_intersects(blocker_corners, p0, p1)


def visible_objects_mask(
    positions: Array,  # [A, 2]
    headings: Array,  # [A]
    lengths: Array,  # [A]
    widths: Array,  # [A]
    exists: Array,  # [A] bool
    ego_index: Array,  # int
    view_dist: float = 80.0,
    view_angle: float = jnp.pi * (120.0 / 180.0),
    head_angle: float = 0.0,
) -> Array:
    """[A] bool — objects visible from the ego under cone + occlusion.

    Defaults mirror Nocturne's kViewDist/kViewAngle-style usage; the
    reference passes these per call (scenario.h:76-100 config).
    """
    A = positions.shape[0]
    ego_pos = positions[ego_index]
    ego_heading = angle_sub(jnp.zeros(()), -(headings[ego_index] + head_angle))

    corners = obb_corners(positions, headings, lengths, widths)  # [A, 4, 2]

    # cone test on any corner (view_field.cc VisibleObjects: an object is
    # candidate-visible if any corner is inside the sector)
    rel = corners - ego_pos[None, None, :]  # [A, 4, 2]
    dist = jnp.linalg.norm(rel, axis=-1)
    azimuth = jnp.arctan2(rel[..., 1], rel[..., 0])
    in_radius = dist <= view_dist
    in_angle = jnp.abs(angle_sub(ego_heading, azimuth)) <= view_angle / 2.0
    corner_in_cone = in_radius & in_angle  # [A, 4]
    in_cone = jnp.any(corner_in_cone, axis=-1)

    # occlusion: target corner visible iff its sight segment crosses no
    # OTHER (non-ego, non-target) existing object's box
    # sight segments: ego_pos -> corner [A, 4]
    def corner_visible(target_idx):
        p1 = corners[target_idx]  # [4, 2]
        p0 = jnp.broadcast_to(ego_pos, p1.shape)
        # blocked[b, c] = blocker b occludes the sight segment to corner c
        blocked = jax.vmap(
            lambda bc: obb_segment_intersects(
                jnp.broadcast_to(bc[None], (4, 4, 2)), p0, p1
            )
        )(corners)  # [A, 4]
        is_blocker = (
            exists
            & (jnp.arange(A) != target_idx)
            & (jnp.arange(A) != ego_index)
        )
        blocked = blocked & is_blocker[:, None]
        corner_occluded = jnp.any(blocked, axis=0)  # [4]
        return jnp.any(~corner_occluded & corner_in_cone[target_idx])

    vis = jax.vmap(corner_visible)(jnp.arange(A))
    vis = vis & exists & in_cone
    return vis.at[ego_index].set(False)


def ego_state(
    position: Array,  # [2]
    heading: Array,
    speed: Array,
    length: Array,
    width: Array,
    goal_position: Array,  # [2]
) -> Array:
    """[5]: speed, dist-to-goal, relative goal azimuth, length, width
    (scenario.cc:391-416)."""
    rel = goal_position - position
    dist = jnp.linalg.norm(rel)
    azimuth = normalize_angle(jnp.arctan2(rel[1], rel[0]) - heading)
    return jnp.stack([speed, dist, azimuth, length, width])


def flattened_visible_state(
    positions: Array,  # [A, 2]
    headings: Array,  # [A]
    speeds: Array,  # [A]
    lengths: Array,  # [A]
    widths: Array,  # [A]
    visible: Array,  # [A] bool (from visible_objects_mask)
    ego_index: Array,
    max_visible_objects: int = 16,
) -> Array:
    """[max_visible_objects, 8] nearest-first visible-object features in the
    ego frame (scenario.cc:418-548): [valid, dist, azimuth, length, width,
    rel_heading, rel_velocity_heading, rel_speed]."""
    A = positions.shape[0]
    ego_pos = positions[ego_index]
    ego_heading = headings[ego_index]

    rel = positions - ego_pos[None]
    dist = jnp.linalg.norm(rel, axis=-1)
    azimuth = normalize_angle(jnp.arctan2(rel[:, 1], rel[:, 0]) - ego_heading)
    rel_heading = angle_sub(ego_heading, headings)
    # relative velocity direction/speed (reference uses speed & heading)
    vel = speeds[:, None] * jnp.stack([jnp.cos(headings), jnp.sin(headings)], -1)
    ego_vel = vel[ego_index]
    rel_vel = vel - ego_vel[None]
    rel_speed = jnp.linalg.norm(rel_vel, axis=-1)
    rel_vel_heading = normalize_angle(
        jnp.arctan2(rel_vel[:, 1], rel_vel[:, 0]) - ego_heading
    )

    feats = jnp.stack(
        [
            visible.astype(positions.dtype),
            dist,
            azimuth,
            lengths,
            widths,
            rel_heading,
            rel_vel_heading,
            rel_speed,
        ],
        axis=-1,
    )  # [A, 8]
    order = jnp.argsort(jnp.where(visible, dist, jnp.inf))
    feats = jnp.take(feats, order, axis=0)
    take = min(max_visible_objects, A)
    out = jnp.zeros((max_visible_objects, 8), positions.dtype)
    out = out.at[:take].set(feats[:take] * feats[:take, :1])
    return out
