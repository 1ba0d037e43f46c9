"""CTG++ diffusion guidance (models/ctg/guidance.py).

The reference names GoalGuide / CollisionGuide / n_step_guided_p_sample but
ships no diffusion_guidance module (modules/diffusion.py:14, call-sites
commented out). These tests cover the working implementation: cost
semantics, the local->global inverse of the per-agent frame, and that
guided sampling actually moves the diffused futures toward the objective.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import load_config
from ctrl_sim_tpu.data.ctg_pipeline import agents_local_frame
from ctrl_sim_tpu.models.ctg.guidance import (
    collision_guide,
    combine,
    goal_guide,
    local_to_global,
)

CFG = load_config(
    {
        "model.hidden_dim": 32,
        "model.dim_feedforward": 64,
        "model.num_heads": 2,
        "model.ctg_plus_plus": True,
        "model.use_rtg": False,
        "model.n_diffusion_steps": 8,
        "model.n_eval_diffusion_step": 4,
        "waymo.train_context_length": 8,
        "waymo.input_horizon": 4,
        "waymo.max_num_agents": 4,
        "waymo.max_num_road_polylines": 6,
        "waymo.max_num_road_pts_per_polyline": 8,
    }
)


def _cond(rng, B=2, N=4, T_in=4):
    past = jnp.asarray(rng.normal(size=(B, N, T_in, 8)), jnp.float32)
    past = past.at[..., -1].set(1.0)
    return {
        "agent_past_states": past,
        "goals": jnp.asarray(rng.normal(size=(B, N, 5)), jnp.float32),
        "moving_agent_mask": jnp.ones((B, N)),
    }


def test_goal_guide_orders_costs():
    rng = np.random.default_rng(0)
    cond = _cond(rng)
    g = goal_guide(1.0)
    x = jnp.zeros((2, 4, 6, 7))
    # futures ending exactly at the goal cost ~0
    x_at_goal = x.at[..., -1, :2].set(cond["goals"][..., None, :2][..., 0, :])
    c0 = float(g(x_at_goal, cond))
    c1 = float(g(x_at_goal.at[..., -1, :2].add(0.5), cond))
    assert c0 < 1e-10
    assert c1 > c0
    grad = jax.grad(lambda xx: g(xx, cond))(x)
    assert np.isfinite(np.asarray(grad)).all()


def test_local_to_global_inverts_agent_frame():
    rng = np.random.default_rng(1)
    A, T = 4, 6
    states = jnp.asarray(rng.normal(size=(A, T, 8)) * 5.0, jnp.float32)
    states = states.at[..., -1].set(1.0)
    anchor = states[:, -1]
    local13 = agents_local_frame(states, anchor)
    pos_div = 100.0
    back = local_to_global(
        (local13[..., :2] / pos_div)[None], anchor[None], pos_div
    )[0]
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(states[..., :2]), atol=1e-3
    )


def test_collision_guide_penalizes_proximity():
    rng = np.random.default_rng(2)
    B, N, T = 1, 3, 5
    cond = _cond(rng, B=B, N=N)
    # anchors: agents 0/1 at the same spot, agent 2 far away; zero yaw
    anchor = jnp.zeros((B, N, 8)).at[..., -1].set(1.0)
    anchor = anchor.at[0, 1, 0].set(1.0)  # 1 m apart from agent 0
    anchor = anchor.at[0, 2, 0].set(500.0)
    g = collision_guide(anchor, pos_div=100.0, radius=4.0, weight=1.0)
    x = jnp.zeros((B, N, T, 7))  # all futures stay at their anchors
    c_near = float(g(x, cond))
    assert c_near > 0.0
    # move agent 1's future far away in its local frame -> no penalty from
    # the 0-1 pair; 2 is already far
    x_far = x.at[0, 1, :, 0].set(2.0)  # 2 * pos_div = 200 m
    c_far = float(g(x_far, cond))
    assert c_far < c_near
    grad = jax.grad(lambda xx: g(xx, cond))(x)
    assert np.isfinite(np.asarray(grad)).all()


@pytest.mark.slow  # full sampler twice: ~2.5 min
def test_guided_sampling_moves_toward_goal():
    """End-to-end: classifier guidance on the real sampler pulls the final
    positions toward the goals even with an untrained model."""
    import dataclasses

    from ctrl_sim_tpu.data import stack_scenarios
    from ctrl_sim_tpu.data.ctg_pipeline import build_ctg_batch
    from ctrl_sim_tpu.data.datagen import generate_offline_data
    from ctrl_sim_tpu.data.scenario import Scenario
    from ctrl_sim_tpu.data.synthetic import synthetic_scenario
    from ctrl_sim_tpu.models.ctg_plus_plus import COND_KEYS, CTGPlusPlus

    cfg = CFG
    scenes = [synthetic_scenario(cfg, seed=0, num_agents=4)]
    d = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in dataclasses.asdict(stack_scenarios(scenes, cfg)).items()}
    d["name"] = ""
    sb = Scenario(**d)
    offline = generate_offline_data(cfg, sb)
    batch = build_ctg_batch(cfg, jax.random.PRNGKey(0), sb, offline)

    cond = {k: batch[k] for k in COND_KEYS}
    model = CTGPlusPlus(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1),
        method=CTGPlusPlus.loss,
    )

    g = goal_guide(1.0)

    def final_goal_cost(samples):
        return float(g(samples, cond))

    s_plain = model.apply(
        params, cond, jax.random.PRNGKey(7), method=CTGPlusPlus.sample_from_cond
    )
    s_guided = model.apply(
        params, cond, jax.random.PRNGKey(7),
        method=CTGPlusPlus.sample_from_cond,
        guidance_fn=goal_guide(5.0),
    )
    assert final_goal_cost(s_guided) < final_goal_cost(s_plain), (
        final_goal_cost(s_guided), final_goal_cost(s_plain)
    )
