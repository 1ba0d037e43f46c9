"""CTG++ diffusion guidance: goal and collision cost functions.

The reference imports ``modules.diffusion_guidance`` (``GoalGuide``,
``CollisionGuide``, ``n_step_guided_p_sample`` — modules/diffusion.py:14)
but never ships that module; its guidance call-sites are commented out
(:36-39, :170-174). This module makes the interface real: differentiable
costs over the diffused futures whose gradients nudge the denoised mean
(classifier-guidance, the CTG recipe), consumed by
``GaussianDiffusion.sample(guidance_fn=...)``.

Diffused-state layout (data/ctg_pipeline.py:build_ctg_sample):
``x [B, N, T_out, 7]`` = per-agent LOCAL-frame [x, y, vx, vy, yaw] with
positions / ``pos_div`` and velocities / ``vel_div``, then 2 normalized
actions. Goals in ``cond["goals"]`` live in the same local units, so the
goal cost needs no frame work; the collision cost maps each agent's local
positions back to the global frame through the anchor poses the rollout
holds (rollout/ctg_rollout.py:99).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ctrl_sim_tpu.geometry import rotate

Array = jax.Array
GuidanceFn = Callable[[Array, dict], Array]


def _exist_mask(cond: dict) -> Array:
    """[B, N] existence at the present step, times the moving mask."""
    exist = cond["agent_past_states"][..., -1, -1]
    return exist * cond.get("moving_agent_mask", jnp.ones_like(exist))


def goal_guide(weight: float = 1.0) -> GuidanceFn:
    """Mean squared distance between each agent's FINAL diffused position
    and its goal, both in the agent's normalized local frame — the
    ``GoalGuide`` the reference names. Lower = closer to goal."""

    def cost(x: Array, cond: dict) -> Array:
        final = x[..., -1, :2]  # [B, N, 2] local, / pos_div
        goal = cond["goals"][..., :2]
        m = _exist_mask(cond)
        d2 = jnp.sum((final - goal) ** 2, axis=-1)
        return weight * jnp.sum(d2 * m) / jnp.maximum(jnp.sum(m), 1.0)

    return cost


def local_to_global(
    pos_local: Array,  # [B, N, T, 2] normalized local positions
    anchor: Array,  # [B, N, 8] anchor states (x, y, vx, vy, yaw, L, W, exist)
    pos_div: float,
) -> Array:
    """Invert the per-agent local frame (data/ctg_pipeline.py:26-40):
    local = R(rot) (global - t) with rot = pi/2 + sign(-yaw)|yaw|, so
    global = R(-rot) local + t."""
    yaw = anchor[..., 4]
    rot = (jnp.pi / 2) + jnp.sign(-yaw) * jnp.abs(yaw)  # [B, N]
    p = pos_local * pos_div
    unrot = jax.vmap(jax.vmap(lambda v, r: rotate(v, -r)))(p, rot)
    return unrot + anchor[..., None, :2]


def collision_guide(
    anchor: Array,  # [B, N, 8] present anchor states (global frame)
    pos_div: float,
    radius: float = 4.0,
    weight: float = 1.0,
) -> GuidanceFn:
    """Pairwise proximity penalty over the diffused futures — the
    ``CollisionGuide`` the reference names. Each agent's local positions
    are mapped to the global frame via its anchor; pairs closer than
    ``radius`` at any future step pay a smooth hinge penalty."""

    def cost(x: Array, cond: dict) -> Array:
        gpos = local_to_global(x[..., :2], anchor, pos_div)  # [B, N, T, 2]
        m = _exist_mask(cond)  # [B, N]
        diff = gpos[:, :, None] - gpos[:, None, :]  # [B, N, N, T, 2]
        d = jnp.sqrt(jnp.sum(diff**2, axis=-1) + 1e-9)  # [B, N, N, T]
        N = d.shape[1]
        pair = (
            (jnp.arange(N)[:, None] < jnp.arange(N)[None, :])[None, :, :, None]
            & (m[:, :, None, None] > 0)
            & (m[:, None, :, None] > 0)
        )
        pen = jnp.where(pair, jnp.maximum(radius - d, 0.0) ** 2, 0.0)
        return weight * jnp.sum(pen) / jnp.maximum(
            jnp.sum(pair.astype(jnp.float32)), 1.0
        )

    return cost


def combine(*fns: GuidanceFn) -> GuidanceFn:
    """Sum several guidance costs."""

    def cost(x: Array, cond: dict) -> Array:
        total = jnp.asarray(0.0)
        for f in fns:
            total = total + f(x, cond)
        return total

    return cost
