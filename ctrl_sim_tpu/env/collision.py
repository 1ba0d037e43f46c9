"""Collision detection: dense masked all-pairs replacing Nocturne's BVH.

Reference semantics (nocturne/cpp/src/scenario.cc:294-328 UpdateCollision):

- vehicle-vehicle: SAT intersection of the two oriented bounding boxes;
  both participants get the VEHICLE_VEHICLE flag (the loop visits every
  ordered pair).
- vehicle-road-edge: the vehicle polygon intersecting any road-edge line
  segment sets VEHICLE_ROAD flag (only road_edge polylines carry
  check_collision, scenario.cc:1015).
- flags are reset every step before the dynamics update (scenario.cc:277).

Dead (non-existent) agents are teleported to (-1e6, -1e6) by the reference
evaluator and *still participate* in collision checks there — two dead agents
"collide" at the sentinel position, and downstream code masks those rewards by
existence. We replicate participation for parity; padded (never-real) agent
slots are excluded via ``agent_valid``.

At <=24 agents and ~1k edge segments per scene the dense O(A^2 + A*S) masked
test is a handful of fused VPU ops per scene — faster than any tree traversal
could be on TPU, and trivially batched over thousands of scenes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctrl_sim_tpu.geometry import obb_corners, obb_obb_intersects, obb_segment_hits

Array = jax.Array


def detect_collisions(
    position: Array,  # [A, 2]
    heading: Array,  # [A]
    length: Array,  # [A]
    width: Array,  # [A]
    agent_valid: Array,  # [A] bool — real (non-padding) agent slots
    seg_p0: Array,  # [S, 2]
    seg_p1: Array,  # [S, 2]
    seg_valid: Array,  # [S] bool
) -> tuple[Array, Array]:
    """Per-agent (veh_veh, veh_edge) collision flags for one scene.

    vmap over a leading env axis for the batched case.
    """
    corners = obb_corners(position, heading, length, width)  # [A, 4, 2]

    # vehicle-vehicle: all pairs SAT
    hit = obb_obb_intersects(corners[:, None], corners[None, :])  # [A, A]
    num_agents = position.shape[0]
    eye = jnp.eye(num_agents, dtype=bool)
    pair_mask = agent_valid[:, None] & agent_valid[None, :] & ~eye
    veh_veh = jnp.any(hit & pair_mask, axis=-1)

    # vehicle-edge: rectangle vs every valid segment via the support-function
    # form — identical predicate, no [A, S, 4, 2] broadcast intermediates
    # (those were ~11% of rollout device time at 256 lanes)
    seg_hit = obb_segment_hits(
        position, heading, length, width, seg_p0, seg_p1
    )  # [A, S]
    veh_edge = jnp.any(seg_hit & seg_valid[None, :], axis=-1) & agent_valid

    return veh_veh & agent_valid, veh_edge
