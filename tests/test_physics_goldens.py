"""Parity vs the EXECUTED reference physics engine.

tests/goldens/reference_physics.npz holds state streams produced by
native/refphys/driver.cc — a harness linking the reference's own
FreeCar + Box2D (nocturne/cpp/src/physics/*, third_party/box2d), stepping
FreeCar::Step per car then b2World::Step(dt, 8, 3)
(PhysicsSimulation.cpp:16-25) — under scripted action sequences.
Regenerate with tools/make_physics_goldens.py.

These tests assert the JAX ``freecar_step`` reproduces the engine itself
(BASELINE configs 1-2 at the "matched engine" level), not just its formulas:

- contact-free driving (free, brake fixtures): trajectories match to ~1e-4
  absolute over 70-90 steps, including the persistent-command and
  brake-deadband edge cases;
- two-car collisions (headon, tbone fixtures): exact match up to first
  contact, and the contact solver (env/contacts.py) keeps post-impact
  deviation bounded vs the real Box2D solver (the manifold/Jacobi
  simplifications are documented there).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import PhysicsConfig
from ctrl_sim_tpu.env.contacts import resolve_contacts
from ctrl_sim_tpu.env.dynamics import BodyState, body_state_from_pose, freecar_step

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "reference_physics.npz")


@pytest.fixture(scope="module")
def goldens():
    if not os.path.exists(GOLDENS):
        pytest.skip("reference_physics.npz not generated")
    return np.load(GOLDENS)


def _init_state(init: np.ndarray) -> BodyState:
    """init [n, 6] = (width, length, x, y, heading, speed) — the driver's
    Vehicle::CreatePhysicsBody replication."""
    return body_state_from_pose(
        jnp.asarray(init[:, 2:4]), jnp.asarray(init[:, 4]), jnp.asarray(init[:, 5])
    )


def _rollout_freecar(init, actions, dt, contacts=False):
    """Scan freecar_step (+ optional contact resolution) over the action
    stream; returns [T, n, 4] (x, y, heading, speed)."""
    length = jnp.asarray(init[:, 1])
    width = jnp.asarray(init[:, 0])
    state0 = _init_state(init)
    dynamic = jnp.ones(init.shape[0], bool)

    def step(state, act):
        nxt = freecar_step(state, act[:, 0], act[:, 1], length, dt)
        if contacts:
            nxt = resolve_contacts(
                state, nxt, length, width, dynamic,
                jnp.zeros_like(dynamic), dt, PhysicsConfig(),
            )
        return nxt, jnp.concatenate(
            [nxt.position, nxt.heading[:, None], nxt.speed[:, None]], axis=-1
        )

    _, traj = jax.lax.scan(step, state0, jnp.asarray(actions))
    return np.asarray(traj)


def _heading_err(a, b):
    return np.abs(np.angle(np.exp(1j * (a - b))))


@pytest.mark.parametrize("name", ["free", "brake"])
def test_contact_free_parity(goldens, name):
    """Free driving matches the executed engine to ~1e-4 m over the episode
    (f32 accumulation is the only divergence source)."""
    init = goldens[f"{name}_init"]
    actions = goldens[f"{name}_actions"]
    ref = goldens[f"{name}_states"]  # [T, n, 7]
    dt = float(goldens["dt"])
    traj = _rollout_freecar(init, actions, dt)

    pos_err = np.abs(traj[..., :2] - ref[..., :2]).max()
    hd_err = _heading_err(traj[..., 2], ref[..., 2]).max()
    sp_err = np.abs(traj[..., 3] - ref[..., 3]).max()
    assert pos_err < 2e-4, f"{name}: position err {pos_err}"
    assert hd_err < 1e-4, f"{name}: heading err {hd_err}"
    assert sp_err < 1e-4, f"{name}: speed err {sp_err}"


# per-fixture absolute deviation bounds (m), ~1.5x the measured values of
# the solver (round 5: headon 0.010, tbone 0.542, oblique 0.028, pileup3
# 0.144 — the b2CollidePolygons manifold with skin-filtered world points
# plus the ROTATIONAL position pass closed the oblique gap from round 4's
# 2.354; the t-bone remainder is the frozen-manifold / no-warm-start
# simplification documented in env/contacts.py)
_FINAL_BOUND = {
    "collide_headon": 0.05,
    "collide_tbone": 0.8,
    "collide_oblique": 0.1,
    "pileup3": 0.25,
}


@pytest.mark.parametrize(
    "name", ["collide_headon", "collide_tbone", "collide_oblique", "pileup3"]
)
def test_collision_parity(goldens, name):
    """Exact parity before contact; bounded deviation vs the real Box2D
    solver after (the contact solver's manifold simplifications are
    documented in env/contacts.py). Fixtures cover head-on, t-bone,
    oblique/glancing, and a 3-car pileup (multi-body coupling)."""
    init = goldens[f"{name}_init"]
    actions = goldens[f"{name}_actions"]
    ref = goldens[f"{name}_states"]
    dt = float(goldens["dt"])
    traj = _rollout_freecar(init, actions, dt, contacts=True)

    err = np.linalg.norm(traj[..., :2] - ref[..., :2], axis=-1)  # [T, n]

    # find first contact in the reference stream: speeds deviate from the
    # no-contact rollout there
    free = _rollout_freecar(init, actions, dt, contacts=False)
    contact_t = int(
        np.argmax(np.abs(free[..., :2] - ref[..., :2]).max(axis=(1, 2)) > 1e-3)
    )
    assert contact_t > 5, f"{name}: contact unexpectedly early ({contact_t})"

    # pre-contact: engine-exact
    assert err[: contact_t - 1].max() < 2e-4, (
        f"{name}: pre-contact err {err[:contact_t - 1].max()}"
    )
    # post-contact: the solver must capture >=80% of the contact effect
    ours_final = err[-1].max()
    nocontact_final = np.linalg.norm(
        free[-1, :, :2] - ref[-1, :, :2], axis=-1
    ).max()
    assert ours_final < 0.2 * nocontact_final, (
        f"{name}: solver deviation {ours_final:.3f} m vs pass-through "
        f"{nocontact_final:.3f} m"
    )
    assert ours_final < _FINAL_BOUND[name], (
        f"{name}: post-contact deviation {ours_final:.3f} m"
    )


def test_velocity_readback_matches_engine(goldens):
    """The engine's reported linear velocity components (vx, vy) match the
    JAX body state for the contact-free fixture — the velocity-level FreeCar
    model, not just integrated positions."""
    init = goldens["free_init"]
    actions = goldens["free_actions"]
    ref = goldens["free_states"]
    dt = float(goldens["dt"])

    length = jnp.asarray(init[:, 1])
    state0 = _init_state(init)

    def step(state, act):
        nxt = freecar_step(state, act[:, 0], act[:, 1], length, dt)
        return nxt, jnp.concatenate(
            [nxt.velocity, nxt.angular_velocity[:, None]], axis=-1
        )

    _, vel = jax.lax.scan(step, state0, jnp.asarray(actions))
    vel = np.asarray(vel)
    assert np.abs(vel[..., :2] - ref[..., 4:6]).max() < 1e-4
    assert np.abs(vel[..., 2] - ref[..., 6]).max() < 1e-4
