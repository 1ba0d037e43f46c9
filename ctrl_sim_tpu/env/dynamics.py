"""Vehicle dynamics as pure functions over batched arrays.

Two dynamics contracts, both replicated exactly from the reference:

1. ``kinematic_bicycle_step`` — Object::KinematicBicycleStep
   (nocturne/cpp/src/object.cc:126-137). Used by Nocturne when
   ``physics_simulated`` is off; also the model behind the inverse
   bicycle action reconstruction.

2. ``freecar_step`` — the Box2D FreeCar velocity-level model
   (nocturne/cpp/src/physics/FreeCar.cpp:98-181 + b2World integration),
   which is what the reference *eval and data-generation* paths actually run
   (every vehicle is ``physics_simulated=True`` there,
   evaluators/evaluator.py:33-41, data/generate_offline_rl_dataset.py:27-33).
   Box2D's contact solver is intentionally not replicated: in these scenes
   bodies only touch when a collision metric has already fired, and the
   reference treats collision as a terminal reward event, not a physical
   interaction to resolve.

Plus ``inverse_bicycle_action`` — BicycleModel.backward
(nocturne/bicycle_model.py:51-109), recovering (accel, steer) from
consecutive states for log-replay through physics.

All functions operate elementwise and are designed for
``vmap``/``jit`` over [num_envs, num_agents] leading axes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ctrl_sim_tpu.config import PhysicsConfig
from ctrl_sim_tpu.geometry import angle_add, angle_sub

Array = jax.Array


class BodyState(NamedTuple):
    """Minimal rigid-body state carried between steps.

    ``velocity``/``angular_velocity`` only drive the FreeCar model; the
    kinematic model derives velocity from (speed, heading) like Nocturne does.
    ``throttle_accel``/``brake_accel`` replicate FreeCar's *persistent* command
    state: FreeCar::Brake ignores |value| < 0.001 (FreeCar.cpp:77-82), in which
    case the previous step's commands stay in force.
    """

    position: Array  # [..., 2]
    heading: Array  # [...]
    speed: Array  # [...]  (signed for kinematic; readback |v| for physics)
    velocity: Array  # [..., 2]   physics body linear velocity
    angular_velocity: Array  # [...]
    throttle_accel: Array  # [...]  persistent FreeCar throttle command
    brake_accel: Array  # [...]  persistent FreeCar brake command


def kinematic_bicycle_step(
    position: Array,
    heading: Array,
    speed: Array,
    acceleration: Array,
    steering: Array,
    length: Array,
    dt: float,
) -> tuple[Array, Array, Array]:
    """One kinematic bicycle step (reference: object.cc:126-137).

    v_avg = speed + 0.5*a*dt;  beta = atan(0.5*tan(steer));
    pos += v_avg * dt * (cos, sin)(heading + beta);
    heading += v_avg * cos(beta) * tan(steer) / length * dt;
    speed += a * dt.
    ``max_speed`` is +inf for Nocturne vehicles so no speed clipping applies.
    """
    v = speed + 0.5 * acceleration * dt
    tan_delta = jnp.tan(steering)
    beta = jnp.arctan(0.5 * tan_delta)
    direction = heading + beta
    new_position = position + v[..., None] * dt * jnp.stack(
        [jnp.cos(direction), jnp.sin(direction)], axis=-1
    )
    w = v * jnp.cos(beta) * tan_delta / length
    new_heading = angle_add(heading, w * dt)
    new_speed = speed + acceleration * dt
    return new_position, new_heading, new_speed


def _dampen_speed(speed: Array, target: Array, damping: float, dt: float) -> Array:
    """Move ``speed`` toward ``target`` by at most damping*dt
    (reference: FreeCar.cpp:91-99 DampenSpeed)."""
    reduction = damping * dt
    return jnp.where(
        speed - target > reduction,
        speed - reduction,
        jnp.where(speed - target < -reduction, speed + reduction, target),
    )


def freecar_step(
    state: BodyState,
    acceleration: Array,
    steering: Array,
    length: Array,
    dt: float,
    cfg: PhysicsConfig = PhysicsConfig(),
) -> BodyState:
    """One FreeCar physics step (reference: FreeCar.cpp:98-181 followed by the
    gravity-free b2World velocity integration, PhysicsSimulation.cpp:16-25).

    The action protocol replicates the Python-side split
    (policies/autoregressive_policy.py:268-272): ``acceleration > 0`` maps to
    ``Throttle(acceleration)``; otherwise ``Brake(|acceleration|)``. Brake
    targets zero speed — FreeCar never reverses under brake. Brake commands
    with |a| < 0.001 are ignored by FreeCar::Brake; because the reference
    issues a fresh Throttle/Brake each step, a dropped brake leaves throttle
    and brake at zero, which we model directly.

    The body angle convention is heading - pi/2 (vehicle.cc:137-176), which
    makes body-"forward" equal world direction ``heading + beta``.
    """
    # --- command update (Throttle / Brake, FreeCar.cpp:68-83) -------------
    # acceleration > 0  -> Throttle(a): throttle = a, brake = 0
    # acceleration <= 0 -> Brake(|a|):  ignored when |a| < 0.001 (commands
    #                       persist from the previous step), else throttle = 0,
    #                       brake = |a|.
    is_throttle = acceleration > 0.0
    is_brake = (~is_throttle) & (jnp.abs(acceleration) >= cfg.brake_deadband)
    throttle_accel = jnp.where(
        is_throttle,
        cfg.max_throttle_accel * acceleration,
        jnp.where(is_brake, 0.0, state.throttle_accel),
    )
    brake_accel = jnp.where(
        is_throttle,
        0.0,
        jnp.where(is_brake, cfg.max_brake_accel * -acceleration, state.brake_accel),
    )

    # --- accel/target resolution (FreeCar.cpp:101-137) --------------------
    accelerating_fwd = throttle_accel > brake_accel
    speed_target_pos = jnp.where(accelerating_fwd, cfg.max_speed, 0.0)
    accel_pos = jnp.where(
        accelerating_fwd, throttle_accel - brake_accel, brake_accel - throttle_accel
    )
    accelerating_rev = throttle_accel < -brake_accel
    speed_target_neg = jnp.where(accelerating_rev, cfg.max_reverse_speed, 0.0)
    accel_neg = jnp.where(
        accelerating_rev, -throttle_accel - brake_accel, brake_accel + throttle_accel
    )
    throttle_positive = throttle_accel > 0.0
    speed_target = jnp.where(throttle_positive, speed_target_pos, speed_target_neg)
    accel_mag = jnp.where(throttle_positive, accel_pos, accel_neg)

    beta = jnp.arctan(0.5 * jnp.tan(steering))
    direction = state.heading + beta
    forward = jnp.stack([jnp.cos(direction), jnp.sin(direction)], axis=-1)
    right = jnp.stack([jnp.sin(direction), -jnp.cos(direction)], axis=-1)

    speed_forward = jnp.sum(state.velocity * forward, axis=-1)
    speed_right = jnp.sum(state.velocity * right, axis=-1)

    delta_v = accel_mag * dt
    speed_forward = jnp.where(
        speed_forward < speed_target,
        jnp.minimum(speed_forward + delta_v, speed_target),
        jnp.maximum(speed_forward - delta_v, speed_target),
    )

    # steering -> target angular speed; min turn radius = vehicle length
    # (FreeCar.cpp:167-173; m_MinTurnRadius = length, FreeCar.cpp:22)
    tan_steer = jnp.tan(steering)
    steering_angular_speed = jnp.where(
        jnp.abs(steering) > 1e-7,
        speed_forward * tan_steer * jnp.cos(beta) / length,
        0.0,
    )

    speed_right = _dampen_speed(speed_right, 0.0, cfg.side_speed_damping, dt)
    angular_velocity = _dampen_speed(
        state.angular_velocity, steering_angular_speed, cfg.angular_damping, dt
    )

    velocity = right * speed_right[..., None] + forward * speed_forward[..., None]

    # b2World::Step semi-implicit Euler (velocities already set above)
    position = state.position + velocity * dt
    heading = angle_add(state.heading, angular_velocity * dt)
    # Vehicle::Step readback: speed = |v| (BaseCar.cpp:45-50), heading = angle + pi/2
    speed = jnp.sqrt(jnp.maximum(jnp.sum(velocity * velocity, axis=-1), 0.0))
    return BodyState(
        position=position,
        heading=heading,
        speed=speed,
        velocity=velocity,
        angular_velocity=angular_velocity,
        throttle_accel=throttle_accel,
        brake_accel=brake_accel,
    )


def body_state_from_pose(position: Array, heading: Array, speed: Array) -> BodyState:
    """Initialize a physics body from (pos, heading, speed) the way
    Vehicle::CreatePhysicsBody does (vehicle.cc:139-176): linear velocity is
    speed along heading, zero angular velocity, zero commands."""
    velocity = speed[..., None] * jnp.stack(
        [jnp.cos(heading), jnp.sin(heading)], axis=-1
    )
    zeros = jnp.zeros_like(heading)
    return BodyState(
        position=position,
        heading=heading,
        speed=speed,
        velocity=velocity,
        angular_velocity=zeros,
        throttle_accel=zeros,
        brake_accel=zeros,
    )


def inverse_bicycle_action(
    next_position: Array,
    next_heading: Array,
    next_speed: Array,
    prev_position: Array,
    prev_heading: Array,
    prev_speed: Array,
    length: Array,
    dt: float,
    max_steer: float = 0.7,
) -> tuple[Array, Array]:
    """Recover (accel, steer) that move prev -> next states
    (reference: nocturne/bicycle_model.py:51-109 BicycleModel.backward with
    prev_theta and prev_vel provided, as all call sites do).

    accel = (v_next - v_prev) / dt
    w     = angle_sub(theta_prev, theta_next) / dt
    C     = 2 L w / (v_next + v_prev + 1e-10)
    steer = clip(atan(2C / sqrt(4 - C^2)), -0.7, 0.7), NaN -> 0
    """
    del next_position, prev_position  # positions unused when theta/vel given
    accel = (next_speed - prev_speed) / dt
    w = angle_sub(prev_heading, next_heading) / dt
    c = 2.0 * length * w / (next_speed + prev_speed + 1e-10)
    denom_sq = 4.0 - c * c
    safe = denom_sq > 0.0
    steer = jnp.where(
        safe,
        jnp.arctan(2.0 * c / jnp.sqrt(jnp.where(safe, denom_sq, 1.0))),
        0.0,
    )
    steer = jnp.clip(steer, -max_steer, max_steer)
    return accel, steer
