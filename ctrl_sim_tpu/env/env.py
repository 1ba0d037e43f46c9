"""The batched driving environment: the TPU-native Nocturne replacement.

One ``WaymoEnv.step`` advances every agent of every scene in lockstep:

    reference control flow (per scene, per step, Python<->C++ crossings:
    policy_evaluator.py:514-542 -> pybind -> Scenario::Step,
    PhysicsSimulation::Step, UpdateCollision)

    here: pure function [E, A, ...] -> [E, A, ...], fully inside jit, vmapped
    collision + reward, no host synchronization anywhere in the rollout.

State/stepping semantics replicated from the reference:

- per-agent control modes: expert log-replay teleport (scenario.cc:277-283),
  FreeCar physics or kinematic bicycle for controlled agents
  (sim.dynamics config),
- dead agents pinned at the (-1e6, -1e6) sentinel
  (autoregressive_policy.py:263),
- collision flags recomputed from scratch every step after dynamics
  (scenario.cc:266-296),
- sticky position-goal-achieved reward bit carried in env state
  (utils/sim.py:97-102).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.data.scenario import DEAD_POSITION, Scenario
from ctrl_sim_tpu.env.collision import detect_collisions
from ctrl_sim_tpu.env.dynamics import (
    BodyState,
    body_state_from_pose,
    freecar_step,
    kinematic_bicycle_step,
)
from ctrl_sim_tpu.env.rewards import compute_reward8

Array = jax.Array


class EnvState(NamedTuple):
    """Dynamic state of a batch of scenes. All arrays lead with [E, A]."""

    bodies: BodyState  # physics bodies (positions [E, A, 2], ...)
    t: Array  # scalar int32 — current timestep (same across envs)
    veh_veh_collision: Array  # [E, A] bool — flags from last UpdateCollision
    veh_edge_collision: Array  # [E, A] bool
    position_achieved: Array  # [E, A] bool — sticky goal bit
    alive: Array  # [E, A] bool — existence chain (once dead, stays dead)


class StepOutput(NamedTuple):
    reward8: Array  # [E, A, 8] — reward at the *pre-step* state
    position: Array  # [E, A, 2] — post-step positions
    heading: Array  # [E, A]
    speed: Array  # [E, A]
    velocity: Array  # [E, A, 2]


class WaymoEnv:
    """Functional batched environment. Methods are pure; wrap in jit/vmap."""

    def __init__(self, cfg: Config):
        self.cfg = cfg

    # ------------------------------------------------------------------
    def reset(self, scenario: Scenario, start_time: int = 0) -> EnvState:
        """Initialize bodies from the GT trajectory at ``start_time`` and run
        the initial collision pass (scenario.cc:254-258)."""
        pos = jnp.asarray(scenario.traj_position[:, :, start_time])
        heading = jnp.asarray(scenario.traj_heading[:, :, start_time])
        speed = jnp.asarray(scenario.traj_speed[:, :, start_time])
        bodies = body_state_from_pose(pos, heading, speed)
        alive = jnp.asarray(scenario.traj_valid[:, :, start_time]) & jnp.asarray(
            scenario.agent_valid
        )
        veh_veh, veh_edge = self._collisions(scenario, bodies)
        return EnvState(
            bodies=bodies,
            t=jnp.asarray(start_time, dtype=jnp.int32),
            veh_veh_collision=veh_veh,
            veh_edge_collision=veh_edge,
            position_achieved=jnp.zeros_like(alive),
            alive=alive,
        )

    # ------------------------------------------------------------------
    def _collisions(self, scenario: Scenario, bodies: BodyState):
        return jax.vmap(detect_collisions)(
            bodies.position,
            bodies.heading,
            jnp.asarray(scenario.length),
            jnp.asarray(scenario.width),
            jnp.asarray(scenario.agent_valid),
            jnp.asarray(scenario.edge_seg_p0),
            jnp.asarray(scenario.edge_seg_p1),
            jnp.asarray(scenario.edge_seg_valid),
        )

    # ------------------------------------------------------------------
    def observe(
        self,
        scenario: Scenario,
        state: EnvState,
        ego_index: Array,  # [E] int — ego agent per scene
        max_visible_objects: int = 16,
        max_visible_lights: int = 20,
        max_visible_road_points: int = 300,
        max_visible_stop_signs: int = 4,
        road_edge_first: bool = True,
        view_dist: float = 80.0,
        view_angle: float = jnp.pi * (120.0 / 180.0),
    ) -> dict:
        """Ego-centric partially-observable observation — the Nocturne
        visible-state API, all four blocks (scenario.cc:418-489
        VisibleState: objects, road points, traffic lights, stop signs +
        view_field.cc cone/occlusion filtering), batched over scenes.

        Returns a dict of fixed-shape arrays:
          ego_state        [E, 5]
          visible_mask     [E, A] bool (cone + occlusion)
          visible_objects  [E, max_visible_objects, 13] nearest-first
                           ([valid, dist, azimuth, length, width,
                           rel_heading, rel_vel_heading, rel_speed,
                           5-type one-hot])
          road_points      [E, max_visible_road_points, 13] cone-filtered,
                           occlusion-aware, road-edge-first
                           ([valid, dist, azimuth, neighbor_dist,
                           neighbor_azimuth, 8-type one-hot])
          traffic_lights   [E, max_visible_lights, 12] ([valid, dist,
                           azimuth, 9-state one-hot]); all-zero when the
                           scenario has no lights
          stop_signs       [E, max_visible_stop_signs, 3] ([valid, dist,
                           azimuth])
        """
        from ctrl_sim_tpu.env.observation import (
            ego_state as _ego_state,
            flattened_visible_state,
            road_point_features,
            stop_sign_features,
            visible_objects_mask,
        )
        from ctrl_sim_tpu.env.traffic_lights import (
            TrafficLights,
            visible_light_features,
        )
        from ctrl_sim_tpu.geometry import obb_corners

        b = state.bodies
        length = jnp.asarray(scenario.length)
        width = jnp.asarray(scenario.width)
        goal = jnp.asarray(scenario.goal_position)
        agent_type = jnp.asarray(scenario.agent_type)
        roads = jnp.asarray(scenario.road_points)
        road_types = jnp.asarray(scenario.road_types)

        def one(pos, hd, spd, ln, wd, types, alive, ego, gp, rp, rt):
            vis = visible_objects_mask(
                pos, hd, ln, wd, alive, ego,
                view_dist=view_dist, view_angle=view_angle,
            )
            es = _ego_state(pos[ego], hd[ego], spd[ego], ln[ego], wd[ego], gp[ego])
            fv = flattened_visible_state(
                pos, hd, spd, ln, wd, vis, ego,
                max_visible_objects=max_visible_objects,
                agent_types=types,
            )
            # road points: occluders are the VISIBLE sight-blocking objects
            # (scenario.cc:357-359 — VisibleRoadPoints runs after
            # FilterVisibleObjects)
            corners = obb_corners(pos, hd, ln, wd)
            rpf = road_point_features(
                rp, rt, pos[ego], hd[ego], corners, vis,
                max_visible_road_points=max_visible_road_points,
                road_edge_first=road_edge_first,
                view_dist=view_dist, view_angle=view_angle,
            )
            ssf = stop_sign_features(
                rp, rt, pos[ego], hd[ego],
                max_visible_stop_signs=max_visible_stop_signs,
                view_dist=view_dist, view_angle=view_angle,
            )
            return vis, es, fv, rpf, ssf

        vis, es, fv, rpf, ssf = jax.vmap(one)(
            b.position, b.heading, b.speed, length, width, agent_type,
            state.alive, ego_index, goal, roads, road_types,
        )

        if scenario.tl_state is not None:
            lights = TrafficLights(
                position=jnp.asarray(scenario.tl_position),
                state=jnp.asarray(scenario.tl_state),
                valid=jnp.asarray(scenario.tl_valid),
            )
            ego_pos = jnp.take_along_axis(
                b.position, ego_index[:, None, None], axis=1
            )[:, 0]
            ego_hd = jnp.take_along_axis(b.heading, ego_index[:, None], axis=1)[:, 0]
            tl = jax.vmap(
                lambda lp, ls, lv, p, h: visible_light_features(
                    TrafficLights(lp, ls, lv), state.t, p, h,
                    max_visible=max_visible_lights,
                )
            )(lights.position, lights.state, lights.valid, ego_pos, ego_hd)
        else:
            E = b.position.shape[0]
            tl = jnp.zeros((E, max_visible_lights, 12))

        return {
            "ego_state": es,
            "visible_mask": vis,
            "visible_objects": fv,
            "road_points": rpf,
            "traffic_lights": tl,
            "stop_signs": ssf,
        }

    # ------------------------------------------------------------------
    def reward(self, scenario: Scenario, state: EnvState) -> tuple[Array, EnvState]:
        """Compute the 8-component reward at the current state and update the
        sticky goal bit (called before stepping, like
        policy_evaluator.py:515 -> utils/sim.py:83)."""
        veh_veh = state.veh_veh_collision
        veh_edge = state.veh_edge_collision
        if not self.cfg.sim.collision_fix:
            # legacy merged-flag semantics (sim.py:137-139 via the single
            # collision_type_): UpdateCollision checks edges AFTER vehicles
            # and the merged flag is last-write-wins (scenario.cc:294-327,
            # object_base.h:55-63), so an edge collision masks the
            # vehicle-vehicle report for that step
            veh_veh = veh_veh & ~veh_edge
        reward8, position_achieved = compute_reward8(
            state.bodies.position,
            state.bodies.speed,
            state.bodies.heading,
            jnp.asarray(scenario.goal_position),
            jnp.asarray(scenario.goal_speed),
            jnp.asarray(scenario.goal_heading),
            jnp.asarray(scenario.goal_dist_normalizer),
            state.position_achieved,
            veh_veh,
            veh_edge,
            self.cfg.sim.rewards,
        )
        return reward8, state._replace(position_achieved=position_achieved)

    # ------------------------------------------------------------------
    def step(
        self,
        scenario: Scenario,
        state: EnvState,
        acceleration: Array,  # [E, A]
        steering: Array,  # [E, A]
        expert_mask: Array,  # [E, A] bool — log-replay teleport agents
        alive_next: Array,  # [E, A] bool — existence after this transition
    ) -> tuple[EnvState, StepOutput]:
        """Advance all scenes by dt.

        ``alive_next`` encodes the reference's existence chaining: the caller
        derives it from the GT validity stream (gt[t+1] for replay agents;
        gt[t] chain for policy agents — see evaluator.py:160-173 and
        policy_evaluator.py:118-121). Dead agents are pinned at the sentinel
        position with zeroed velocity.
        """
        sim = self.cfg.sim
        bodies = state.bodies
        t_next = state.t + 1

        if sim.dynamics == "physics":
            stepped = freecar_step(
                bodies,
                acceleration,
                steering,
                jnp.asarray(scenario.length),
                sim.dt,
                sim.physics,
            )
            if sim.resolve_contacts:
                # b2World::Step order: FreeCar proposes velocities, the
                # contact solver corrects them, then positions integrate
                # (env/contacts.py; PhysicsSimulation.cpp:16-25)
                from ctrl_sim_tpu.env.contacts import resolve_contacts

                valid = jnp.asarray(scenario.agent_valid)
                stepped = jax.vmap(
                    lambda pre, prop, ln, wd, dyn, kin: resolve_contacts(
                        pre, prop, ln, wd, dyn, kin, sim.dt, sim.physics
                    )
                )(
                    bodies,
                    stepped,
                    jnp.asarray(scenario.length),
                    jnp.asarray(scenario.width),
                    state.alive & valid & ~expert_mask,
                    state.alive & valid & expert_mask,
                )
        elif sim.dynamics == "kinematic":
            new_pos, new_heading, new_speed = kinematic_bicycle_step(
                bodies.position,
                bodies.heading,
                bodies.speed,
                acceleration,
                steering,
                jnp.asarray(scenario.length),
                sim.dt,
            )
            velocity = new_speed[..., None] * jnp.stack(
                [jnp.cos(new_heading), jnp.sin(new_heading)], axis=-1
            )
            stepped = BodyState(
                position=new_pos,
                heading=new_heading,
                speed=new_speed,
                velocity=velocity,
                # the kinematic contract has no angular state — carrying the
                # pre-step physics value would record a stale rate
                angular_velocity=jnp.zeros_like(bodies.angular_velocity),
                throttle_accel=bodies.throttle_accel,
                brake_accel=bodies.brake_accel,
            )
        else:
            raise ValueError(f"unknown dynamics contract {sim.dynamics!r}")

        # expert log-replay teleport (scenario.cc:277-283): pose from the GT
        # trajectory at the *new* time; velocity mirrored into the body the
        # way Vehicle setters do (vehicle.cc:75-107).
        T1 = scenario.traj_position.shape[2]
        t_idx = jnp.minimum(t_next, T1 - 1)
        gt_pos = jnp.asarray(scenario.traj_position)[:, :, t_idx]
        gt_heading = jnp.asarray(scenario.traj_heading)[:, :, t_idx]
        gt_speed = jnp.asarray(scenario.traj_speed)[:, :, t_idx]
        gt_bodies = body_state_from_pose(gt_pos, gt_heading, gt_speed)

        em = expert_mask
        merged = BodyState(
            position=jnp.where(em[..., None], gt_bodies.position, stepped.position),
            heading=jnp.where(em, gt_bodies.heading, stepped.heading),
            speed=jnp.where(em, gt_bodies.speed, stepped.speed),
            velocity=jnp.where(em[..., None], gt_bodies.velocity, stepped.velocity),
            angular_velocity=jnp.where(
                em, gt_bodies.angular_velocity, stepped.angular_velocity
            ),
            throttle_accel=jnp.where(em, 0.0, stepped.throttle_accel),
            brake_accel=jnp.where(em, 0.0, stepped.brake_accel),
        )

        # dead agents: pin to sentinel (autoregressive_policy.py:263)
        dead = ~alive_next
        sentinel = jnp.full_like(merged.position, DEAD_POSITION)
        merged = BodyState(
            position=jnp.where(dead[..., None], sentinel, merged.position),
            heading=jnp.where(dead, merged.heading, merged.heading),
            speed=jnp.where(dead, 0.0, merged.speed),
            velocity=jnp.where(dead[..., None], 0.0, merged.velocity),
            angular_velocity=jnp.where(dead, 0.0, merged.angular_velocity),
            throttle_accel=jnp.where(dead, 0.0, merged.throttle_accel),
            brake_accel=jnp.where(dead, 0.0, merged.brake_accel),
        )

        veh_veh, veh_edge = self._collisions(scenario, merged)

        new_state = EnvState(
            bodies=merged,
            t=t_next,
            veh_veh_collision=veh_veh,
            veh_edge_collision=veh_edge,
            position_achieved=state.position_achieved,
            alive=alive_next,
        )
        out = StepOutput(
            reward8=jnp.zeros(()),  # rewards are computed via .reward()
            position=merged.position,
            heading=merged.heading,
            speed=merged.speed,
            velocity=merged.velocity,
        )
        return new_state, out
