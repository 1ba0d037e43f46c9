"""Dynamics tests: closed-form checks (the pattern of the reference's
object_test.cc:22-120) plus inverse-model consistency."""

import jax.numpy as jnp
import numpy as np

from ctrl_sim_tpu.config import PhysicsConfig
from ctrl_sim_tpu.env.dynamics import (
    body_state_from_pose,
    freecar_step,
    inverse_bicycle_action,
    kinematic_bicycle_step,
)

DT = 0.1


class TestKinematicBicycle:
    def test_uniform_linear_motion(self):
        # zero accel, zero steer: straight line at constant speed
        # (object_test.cc checks Object::Step against uniform linear motion)
        pos = jnp.array([1.0, 2.0])
        heading = jnp.float32(0.7)
        speed = jnp.float32(8.0)
        p, h, s = pos, heading, speed
        for _ in range(10):
            p, h, s = kinematic_bicycle_step(
                p, h, s, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(4.0), DT
            )
        t = 10 * DT
        want = np.array([1.0 + 8.0 * t * np.cos(0.7), 2.0 + 8.0 * t * np.sin(0.7)])
        np.testing.assert_allclose(np.asarray(p), want, atol=1e-4)
        assert abs(float(h) - 0.7) < 1e-6
        assert abs(float(s) - 8.0) < 1e-6

    def test_constant_acceleration(self):
        # speed integrates a*dt; position uses average speed within the step
        p = jnp.array([0.0, 0.0])
        h = jnp.float32(0.0)
        s = jnp.float32(0.0)
        a = 2.0
        n = 20
        for _ in range(n):
            p, h, s = kinematic_bicycle_step(
                p, h, s, jnp.float32(a), jnp.float32(0.0), jnp.float32(4.0), DT
            )
        assert abs(float(s) - a * n * DT) < 1e-5
        # exact discrete sum: x = sum_k (v_k + 0.5 a dt) dt = 0.5 a t^2 exactly
        t = n * DT
        assert abs(float(p[0]) - 0.5 * a * t * t) < 1e-4
        assert abs(float(p[1])) < 1e-6

    def test_uniform_circular_motion(self):
        # constant steer, constant speed -> circle with radius v/w
        length = 4.0
        steer = 0.3
        speed = 5.0
        tan_d = np.tan(steer)
        beta = np.arctan(0.5 * tan_d)
        w = speed * np.cos(beta) * tan_d / length
        p = jnp.array([0.0, 0.0])
        h = jnp.float32(0.0)
        s = jnp.float32(speed)
        headings = []
        for k in range(50):
            p, h, s = kinematic_bicycle_step(
                p, h, s, jnp.float32(0.0), jnp.float32(steer), jnp.float32(length), DT
            )
            headings.append(float(h))
        # heading advances by w*dt each step (with wrapping)
        for k, hk in enumerate(headings):
            want = (w * DT * (k + 1) + np.pi) % (2 * np.pi) - np.pi
            assert abs(hk - want) < 1e-4

    def test_matches_reference_cpp_formula_random(self):
        # replicate object.cc:126-137 literally in numpy and fuzz
        rng = np.random.default_rng(0)
        for _ in range(100):
            px, py = rng.normal(size=2) * 10
            heading = rng.uniform(-np.pi, np.pi)
            speed = rng.uniform(-5, 20)
            accel = rng.uniform(-10, 10)
            steer = rng.uniform(-0.7, 0.7)
            length = rng.uniform(3, 6)

            v = speed + 0.5 * accel * DT
            tan_delta = np.tan(steer)
            beta = np.arctan(0.5 * tan_delta)
            want_pos = np.array(
                [px + v * DT * np.cos(heading + beta), py + v * DT * np.sin(heading + beta)]
            )
            w = v * np.cos(beta) * tan_delta / length
            want_heading = heading + w * DT
            want_heading = (want_heading + np.pi) % (2 * np.pi) - np.pi
            want_speed = speed + accel * DT

            p, h, s = kinematic_bicycle_step(
                jnp.asarray([px, py], dtype=jnp.float32),
                jnp.float32(heading),
                jnp.float32(speed),
                jnp.float32(accel),
                jnp.float32(steer),
                jnp.float32(length),
                DT,
            )
            np.testing.assert_allclose(np.asarray(p), want_pos, atol=1e-4)
            assert abs(float(h) - want_heading) < 1e-4 or abs(
                abs(float(h) - want_heading) - 2 * np.pi
            ) < 1e-4
            assert abs(float(s) - want_speed) < 1e-5


class TestFreeCar:
    def _mk(self, pos, heading, speed):
        return body_state_from_pose(
            jnp.asarray(pos, dtype=jnp.float32),
            jnp.float32(heading),
            jnp.float32(speed),
        )

    def test_throttle_accelerates_forward(self):
        state = self._mk([0.0, 0.0], 0.0, 5.0)
        accel = jnp.float32(2.0)
        state2 = freecar_step(state, accel, jnp.float32(0.0), jnp.float32(4.0), DT)
        # speed_forward goes 5 -> 5 + 2*0.1 = 5.2, straight along +x
        assert abs(float(state2.speed) - 5.2) < 1e-5
        np.testing.assert_allclose(
            np.asarray(state2.position), [5.2 * DT, 0.0], atol=1e-5
        )
        assert abs(float(state2.heading)) < 1e-6

    def test_brake_decelerates_toward_zero_never_reverses(self):
        state = self._mk([0.0, 0.0], 0.0, 0.3)
        for _ in range(20):
            state = freecar_step(
                state, jnp.float32(-5.0), jnp.float32(0.0), jnp.float32(4.0), DT
            )
        assert abs(float(state.speed)) < 1e-5  # clamped at 0, no reverse

    def test_brake_deadband_keeps_previous_command(self):
        # FreeCar::Brake ignores |value| < 0.001: previous throttle persists
        state = self._mk([0.0, 0.0], 0.0, 0.0)
        state = freecar_step(state, jnp.float32(3.0), jnp.float32(0.0), jnp.float32(4.0), DT)
        v1 = float(state.speed)
        assert abs(v1 - 0.3) < 1e-5
        # sub-deadband brake: old throttle command (3.0) still in force
        state = freecar_step(
            state, jnp.float32(-0.0005), jnp.float32(0.0), jnp.float32(4.0), DT
        )
        assert abs(float(state.speed) - 0.6) < 1e-5

    def test_side_speed_damping(self):
        # car sliding sideways decays lateral speed at 25 m/s^2
        state = self._mk([0.0, 0.0], 0.0, 0.0)
        state = state._replace(velocity=jnp.asarray([0.0, 10.0], dtype=jnp.float32))
        cfg = PhysicsConfig()
        state2 = freecar_step(state, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(4.0), DT, cfg)
        # lateral (right = (0,-1) at heading 0): speed_right=-10 -> damped by 2.5
        assert abs(float(state2.velocity[1]) - 7.5) < 1e-4

    def test_steering_angular_speed_matches_kinematic_rate(self):
        # target angular speed = v*tan(steer)*cos(beta)/length; angular
        # velocity ramps toward it at 10 rad/s^2
        length, steer, speed = 4.0, 0.2, 10.0
        state = self._mk([0.0, 0.0], 0.0, speed)
        tan_d = np.tan(steer)
        beta = np.arctan(0.5 * tan_d)
        # initial velocity is along heading, so its projection onto the
        # forward axis (heading + beta) is speed*cos(beta) (FreeCar.cpp:150-156)
        speed_forward = speed * np.cos(beta)
        target_w = speed_forward * np.cos(beta) * tan_d / length
        state2 = freecar_step(
            state, jnp.float32(0.0), jnp.float32(steer), jnp.float32(length), DT
        )
        want_w = min(target_w, 10.0 * DT)  # damped ramp from 0
        assert abs(float(state2.angular_velocity) - want_w) < 1e-4

    def test_max_speed_cap(self):
        state = self._mk([0.0, 0.0], 0.0, 49.9)
        for _ in range(50):
            state = freecar_step(
                state, jnp.float32(10.0), jnp.float32(0.0), jnp.float32(4.0), DT
            )
        assert float(state.speed) <= 50.0 + 1e-4


class TestInverseBicycle:
    def test_recovers_accel_and_steer_magnitudes(self):
        # roll the FreeCar forward, then reconstruct actions between states;
        # accel must match (v2-v1)/dt exactly, steer the angular change
        rng = np.random.default_rng(5)
        for _ in range(50):
            prev_speed = rng.uniform(1, 15)
            next_speed = rng.uniform(1, 15)
            prev_heading = rng.uniform(-np.pi, np.pi)
            next_heading = prev_heading + rng.uniform(-0.05, 0.05)
            length = rng.uniform(3, 6)
            accel, steer = inverse_bicycle_action(
                jnp.zeros(2), jnp.float32(next_heading), jnp.float32(next_speed),
                jnp.zeros(2), jnp.float32(prev_heading), jnp.float32(prev_speed),
                jnp.float32(length), DT,
            )
            assert abs(float(accel) - (next_speed - prev_speed) / DT) < 1e-4
            # reference formula for steer
            w = ((next_heading - prev_heading + np.pi) % (2 * np.pi) - np.pi) / DT
            c = 2 * length * w / (next_speed + prev_speed + 1e-10)
            want = np.clip(np.arctan(2 * c / np.sqrt(4 - c * c)), -0.7, 0.7)
            assert abs(float(steer) - want) < 1e-4

    def test_nan_guard(self):
        # |C| > 2 would produce NaN in the reference -> steer = 0
        accel, steer = inverse_bicycle_action(
            jnp.zeros(2), jnp.float32(3.0), jnp.float32(0.1),
            jnp.zeros(2), jnp.float32(-3.0), jnp.float32(0.1),
            jnp.float32(5.0), DT,
        )
        assert np.isfinite(float(steer))
