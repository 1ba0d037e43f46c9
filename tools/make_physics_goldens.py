"""Generate executed-reference physics goldens.

Builds (if needed) and runs native/refphys/driver.cc — a harness linking the
REFERENCE's own FreeCar + Box2D engine (nocturne/cpp/src/physics/*,
third_party/box2d) — over scripted action sequences, and stores the resulting
state streams in tests/goldens/reference_physics.npz.

tests/test_physics_goldens.py then asserts that the JAX ``freecar_step``
(+ ``resolve_contacts`` for the contact fixtures) reproduces these streams.
Unlike the formula-level tests in tests/test_dynamics.py, these fixtures were
produced by EXECUTING the reference engine (BASELINE configs 1-2 at the level
that counts): FreeCar::Step per car then b2World::Step(dt, 8, 3)
(PhysicsSimulation.cpp:16-25).

Usage:  python tools/make_physics_goldens.py
"""

from __future__ import annotations

import os
import subprocess

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(REPO, "native", "refphys", "build", "refphys_driver")
OUT = os.path.join(REPO, "tests", "goldens", "reference_physics.npz")

DT = 0.1


def run_driver(init: np.ndarray, actions: np.ndarray) -> np.ndarray:
    """init [n, 6] = (width, length, x, y, heading, speed);
    actions [T, n, 2] = (accel, steer). Returns states [T, n, 7] =
    (x, y, heading, speed, vx, vy, angular_velocity)."""
    n = init.shape[0]
    T = actions.shape[0]
    lines = [f"{n} {DT} {T}"]
    for row in init:
        lines.append(" ".join(f"{v:.9g}" for v in row))
    for t in range(T):
        for i in range(n):
            lines.append(f"{actions[t, i, 0]:.9g} {actions[t, i, 1]:.9g}")
    proc = subprocess.run(
        [DRIVER], input="\n".join(lines) + "\n", capture_output=True, text=True,
        check=True,
    )
    vals = np.array(proc.stdout.split(), dtype=np.float64).reshape(T, n, 7)
    return vals


def fixture_free(rng: np.random.Generator):
    """Three well-separated cars under piecewise-constant random actions —
    pure FreeCar dynamics, no contacts (the 90-step free-driving contract)."""
    init = np.array(
        [
            # width, length, x, y, heading, speed
            [2.0, 4.5, 0.0, 0.0, 0.3, 8.0],
            [2.3, 5.2, 500.0, 0.0, -2.0, 0.0],
            [1.8, 4.0, 0.0, 500.0, 1.8, 14.0],
        ],
        dtype=np.float32,
    )
    T = 90
    actions = np.zeros((T, 3, 2), dtype=np.float32)
    # piecewise-constant commands, changed every 10 steps
    for seg in range(0, T, 10):
        a = rng.uniform(-1.0, 1.0, size=3)
        s = rng.uniform(-0.7, 0.7, size=3)
        actions[seg : seg + 10, :, 0] = a
        actions[seg : seg + 10, :, 1] = s
    return init, actions


def fixture_brake(rng: np.random.Generator):
    """One car exercising the command edge cases: throttle, brake deadband
    (|a| < 0.001 keeps the previous commands in force, FreeCar.cpp:77-82),
    hard brake through stop (brake never reverses), near-zero steering
    (< 1e-7 bypasses the turn-radius division, FreeCar.cpp:167-173)."""
    init = np.array([[2.0, 4.8, 0.0, 0.0, 0.5, 6.0]], dtype=np.float32)
    seq = (
        [(0.8, 0.2)] * 10        # throttle + steer
        + [(-0.0005, 0.2)] * 10  # deadband brake: previous throttle persists
        + [(-1.0, 0.0)] * 15     # hard brake to stop, holds at 0
        + [(0.0, 5e-8)] * 10     # zero accel (deadband again), tiny steer
        + [(0.6, -0.7)] * 15     # throttle, max steer other way
        + [(-0.3, 0.0)] * 10     # moderate brake
    )
    actions = np.array(seq, dtype=np.float32)[:, None, :]
    return init, actions


def fixture_collide_headon(rng: np.random.Generator):
    """Two cars driven at each other head-on: contact at ~t=18; quantifies
    the Box2D contact response (velocity solve + position correction)."""
    init = np.array(
        [
            [2.0, 4.5, 0.0, 0.0, 0.0, 5.0],
            [2.0, 4.5, 25.0, 0.3, np.pi, 5.0],
        ],
        dtype=np.float32,
    )
    T = 40
    actions = np.zeros((T, 2, 2), dtype=np.float32)
    actions[:, :, 0] = 0.5  # keep throttling into the contact
    return init, actions


def fixture_collide_tbone(rng: np.random.Generator):
    """Two cars crossing at 90 degrees, timed to collide — asymmetric
    manifold, spin after impact."""
    init = np.array(
        [
            [2.0, 4.5, 0.0, 0.0, 0.0, 8.0],
            [2.0, 4.5, 16.0, -14.0, np.pi / 2, 7.0],
        ],
        dtype=np.float32,
    )
    T = 40
    actions = np.zeros((T, 2, 2), dtype=np.float32)
    actions[:, :, 0] = 0.3
    return init, actions


def fixture_collide_oblique(rng: np.random.Generator):
    """Two cars converging at ~45 degrees — a glancing contact whose
    manifold normal aligns with neither box axis cleanly; exercises the
    friction/tangent path far more than head-on or t-bone."""
    init = np.array(
        [
            [2.0, 4.5, 0.0, 0.0, 0.0, 8.0],
            [2.0, 4.5, 28.0, -10.0, 3.0 * np.pi / 4.0, 7.0],
        ],
        dtype=np.float32,
    )
    T = 40
    actions = np.zeros((T, 2, 2), dtype=np.float32)
    actions[:, :, 0] = 0.4
    return init, actions


def fixture_pileup3(rng: np.random.Generator):
    """Three-car same-lane chain: a hard-braking lead, a coasting middle,
    a fast throttling tail — sequential rear-end impacts pile up, so one
    pair's response feeds the other within single steps (the multi-body
    regime the frozen-correction-geometry approximation documents)."""
    init = np.array(
        [
            [2.0, 4.5, 0.0, 0.0, 0.0, 13.0],
            [2.0, 4.5, 14.0, 0.2, 0.0, 7.0],
            [2.0, 4.5, 27.0, -0.2, 0.0, 3.0],
        ],
        dtype=np.float32,
    )
    T = 50
    actions = np.zeros((T, 3, 2), dtype=np.float32)
    actions[:, 0, 0] = 0.6   # tail keeps pushing
    actions[:, 1, 0] = 0.0
    actions[:, 2, 0] = -0.8  # lead brakes hard
    return init, actions


def main() -> None:
    if not os.path.exists(DRIVER):
        subprocess.run(
            ["make", "-C", os.path.join(REPO, "native", "refphys"), "-j8"],
            check=True, capture_output=True,
        )
    rng = np.random.default_rng(2026)
    out: dict[str, np.ndarray] = {"dt": np.float32(DT)}
    for name, fn in [
        ("free", fixture_free),
        ("brake", fixture_brake),
        ("collide_headon", fixture_collide_headon),
        ("collide_tbone", fixture_collide_tbone),
        ("collide_oblique", fixture_collide_oblique),
        ("pileup3", fixture_pileup3),
    ]:
        init, actions = fn(rng)
        states = run_driver(init, actions)
        out[f"{name}_init"] = init
        out[f"{name}_actions"] = actions
        out[f"{name}_states"] = states.astype(np.float32)
        print(f"[goldens] {name}: init {init.shape} actions {actions.shape} "
              f"-> states {states.shape}")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"[goldens] wrote {OUT}")


if __name__ == "__main__":
    main()
