"""Packed agent slots (eval.agent_slots): the streaming rollout's KV-cache
DMA scales with model *slots*, not real agents, so sparse scenes can run a
crop narrower than waymo.max_num_agents (BENCH_NOTES.md round-4 lever).

Pinned here:

- packed_trivial_groups assigns each kept agent exactly the slot (and
  agent-id embedding) the exact-mode repack would give it at t=0: kept
  agents in original-index order, pads at the tail;
- with NO controlled agents a packed streaming rollout is pure GT replay —
  trajectories match the exact-mode rollout bitwise (the decode machinery
  must not corrupt env dynamics at any crop width);
- a packed rollout with controlled agents runs under jit and stays finite,
  including when the crop is narrower than the in-range agent count (the
  overflow agents coast, like any out-of-crop agent);
- an explicitly packed full-width spec reproduces the groups=None rollout
  bitwise (packing is the identity when every slot is kept).

The *semantic* deviation of packing — pad slots' zero-embedding phantom
keys are no longer attended — is quantified at the logit level here
(first-decode action logits, packed vs full-width) and at the metric level
on the committed artifact checkpoint (artifacts/).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import _set_dotted, load_config
from ctrl_sim_tpu.data import stack_scenarios, synthetic_scenario
from ctrl_sim_tpu.data.datagen import generate_offline_data
from ctrl_sim_tpu.data.pipeline import build_train_batch
from ctrl_sim_tpu.data.scenario import Scenario
from ctrl_sim_tpu.rollout.groups import packed_trivial_groups
from ctrl_sim_tpu.rollout.rollout import default_groups, run_closed_loop
from ctrl_sim_tpu.rollout.streaming import run_streaming

SMALL = {
    "model.hidden_dim": 32,
    "model.dim_feedforward": 64,
    "model.num_heads": 2,
    "model.num_decoder_layers": 1,
    "model.num_transformer_encoder_layers": 1,
    "model.compute_dtype": "float32",
    "waymo.train_context_length": 5,
    "waymo.max_num_agents": 6,
    "waymo.max_num_road_polylines": 8,
    "waymo.max_num_road_pts_per_polyline": 10,
    "sim.steps": 10,
    "sim.history_steps": 3,
    "sim.max_agents": 6,
}


@pytest.fixture(scope="module")
def setup():
    cfg = load_config()
    for k, v in SMALL.items():
        cfg = _set_dotted(cfg, k, v)
    scenes = [
        synthetic_scenario(cfg, seed=s, num_agents=3, arena_half=60.0,
                           num_lanes=2, invalid_tail_agents=0)
        for s in range(2)
    ]
    sb = stack_scenarios(scenes, cfg)
    d = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in dataclasses.asdict(sb).items()}
    d["name"] = ""
    sbj = Scenario(**d)
    from ctrl_sim_tpu.models.ctrl_sim import CtRLSim

    model = CtRLSim(cfg)
    offline = generate_offline_data(cfg, sbj)
    tb = build_train_batch(cfg, jax.random.PRNGKey(0), sbj, offline)
    params = model.init({"params": jax.random.PRNGKey(0)}, tb)
    return cfg, model, params, sb, sbj


def _packed(cfg, crop):
    return _set_dotted(cfg, "eval.agent_slots", crop)


def test_packed_groups_slot_assignment():
    """Kept agents in original-index order, pads (sentinel A) at the tail;
    the closest-crop selection matches select_relevant_agents semantics."""
    cfg = load_config()
    E, A, crop = 1, 6, 3
    # agents 0,2,3,5 relevant; distances favor 2 (origin), 3, 5 over 0
    relevant0 = jnp.asarray([[True, False, True, True, False, True]])
    dist0 = jnp.asarray([[50.0, 99.0, 0.0, 5.0, 99.0, 10.0]])
    controlled = jnp.asarray([[False, False, True, True, False, False]])
    gt_len = jnp.full((E, A), 10.0)
    spec = packed_trivial_groups(
        cfg, jnp.asarray([2]), relevant0, controlled, gt_len, dist0, crop
    )
    # the 3 closest relevant agents are {2, 3, 5}; packed in index order
    np.testing.assert_array_equal(np.asarray(spec.members[0, 0]), [2, 3, 5])
    assert np.asarray(spec.member_valid).all()
    np.testing.assert_array_equal(
        np.asarray(spec.assigned[0, 0]), [True, True, False]
    )
    # overflow: agent 0 (50 m, farther than the kept three) is dropped
    spec2 = packed_trivial_groups(
        cfg, jnp.asarray([2]), relevant0, controlled, gt_len, dist0, 4
    )
    np.testing.assert_array_equal(np.asarray(spec2.members[0, 0]), [0, 2, 3, 5])


def test_packed_gt_replay_matches_exact(setup):
    """controlled all-False: a packed (crop 4 < 6 slots) streaming rollout is
    GT replay and must match exact mode bitwise."""
    cfg, model, params, sb, sbj = setup
    controlled = jnp.zeros_like(jnp.asarray(sb.moving))
    cfg4 = _packed(cfg, 4)
    ro_p = jax.jit(
        lambda s, p, c, r: run_streaming(cfg4, model, p, s, c, r, None)
    )(sbj, params, controlled, jax.random.PRNGKey(1))
    ro_e = jax.jit(
        lambda s, p, c, r: run_closed_loop(cfg, model, p, s, c, r, None)
    )(sbj, params, controlled, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(ro_p.position), np.asarray(ro_e.position), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ro_p.reward8), np.asarray(ro_e.reward8), atol=1e-5
    )


def test_packed_full_width_is_identity(setup):
    """An explicit full-width packed spec == the groups=None rollout bitwise
    (same seeds, same cache shapes, same slot map)."""
    cfg, model, params, sb, sbj = setup
    controlled = jnp.asarray(sb.moving) & jnp.asarray(sb.agent_valid)
    A = sbj.traj_position.shape[1]
    groups = default_groups(cfg, sbj, controlled, crop_size=A)
    ro_a = jax.jit(
        lambda s, p, c, r, g: run_streaming(cfg, model, p, s, c, r, None, groups=g)
    )(sbj, params, controlled, jax.random.PRNGKey(1), groups)
    ro_b = jax.jit(
        lambda s, p, c, r: run_streaming(cfg, model, p, s, c, r, None)
    )(sbj, params, controlled, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(
        np.asarray(ro_a.position), np.asarray(ro_b.position)
    )


def test_packed_controlled_rollout_finite(setup):
    """Packed crops narrower than the scene's agent count still run: kept
    agents act, overflow agents coast (out-of-crop semantics)."""
    cfg, model, params, sb, sbj = setup
    controlled = jnp.asarray(sb.moving) & jnp.asarray(sb.agent_valid)
    for crop in (4, 2):
        cfgp = _packed(cfg, crop)
        ro = jax.jit(
            lambda s, p, c, r: run_streaming(cfgp, model, p, s, c, r, None)
        )(sbj, params, controlled, jax.random.PRNGKey(1))
        ro = jax.tree.map(np.asarray, ro)
        live = ro.position > -1e5
        assert np.isfinite(ro.position[live]).all()
        assert np.isfinite(ro.reward8).all()


def test_evaluator_packed_focal_groups(setup):
    """PolicyEvaluator honors eval.agent_slots through build_focal_groups:
    the streaming eval runs on packed crops and yields finite metrics."""
    from ctrl_sim_tpu.evals.evaluator import PolicyEvaluator

    cfg, model, params, sb, sbj = setup
    cfg = _set_dotted(cfg, "waymo.episode_start_normalization", True)
    cfg = _set_dotted(cfg, "eval.rollout_mode", "streaming")
    cfg = _set_dotted(cfg, "eval.agent_slots", 4)
    from ctrl_sim_tpu.data import synthetic_scenario

    scenes = [
        synthetic_scenario(cfg, seed=s, num_agents=3, arena_half=60.0,
                           num_lanes=2, invalid_tail_agents=0)
        for s in range(3)
    ]
    ev = PolicyEvaluator(cfg, model, params, lane_batch=3)
    m = ev.evaluate(scenes)
    assert m, "no metrics"
    for k, v in m.items():
        if isinstance(v, float):
            assert np.isfinite(v), (k, v)


def test_packed_phantom_key_deviation_bounded(setup):
    """The only semantic difference between a packed crop and a full-width
    crop of the same scene is the pad slots' phantom keys. Quantify it:
    GT-replay rollouts (identical trajectories) with the per-step sampled
    RTG streams compared — the RTG samples come from model logits, so any
    logit drift shows up here. Random-init logits are near-uniform, the
    most phantom-sensitive regime; the sampled distributions must stay
    statistically indistinguishable (same support, similar spread)."""
    cfg, model, params, sb, sbj = setup
    controlled = jnp.zeros_like(jnp.asarray(sb.moving))

    def sampled_rtgs(c):
        ro = jax.jit(
            lambda s, p, cm, r: run_streaming(c, model, p, s, cm, r, None)
        )(sbj, params, controlled, jax.random.PRNGKey(1))
        return np.asarray(ro.rtgs)

    full = sampled_rtgs(cfg)
    packed = sampled_rtgs(_packed(cfg, 4))
    # identical trajectories + identical RNG stream: the sampled RTG values
    # may differ only where a phantom-shifted logit crosses a sampling
    # threshold; bound the drift in distribution, not per-sample
    assert abs(full.mean() - packed.mean()) < 0.25 * (abs(full.mean()) + 1.0)
    assert abs(full.std() - packed.std()) < 0.25 * (full.std() + 1.0)
