"""Planner-vs-adversary evaluator + finetuning store tests (small config)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import TiltConfig, load_config
from ctrl_sim_tpu.data import synthetic_scenario, stack_scenarios
from ctrl_sim_tpu.data.datagen import generate_offline_data
from ctrl_sim_tpu.data.finetune import FinetuningStore
from ctrl_sim_tpu.data.pipeline import build_train_batch
from ctrl_sim_tpu.data.scenario import Scenario
from ctrl_sim_tpu.data.store import ScenarioStore
from ctrl_sim_tpu.evals.cat import make_adversarial_scenario, polyline_vel, polyline_yaw
from ctrl_sim_tpu.evals.planner_adversary import PlannerAdversaryEvaluator
from ctrl_sim_tpu.models.ctrl_sim import CtRLSim

pytestmark = pytest.mark.slow  # closed-loop two-policy eval: ~2 min

SMALL = {
    "model.hidden_dim": 32,
    "model.dim_feedforward": 64,
    "model.num_heads": 2,
    "model.num_decoder_layers": 1,
    "model.num_transformer_encoder_layers": 1,
    "model.compute_dtype": "float32",
    "waymo.train_context_length": 6,
    "waymo.max_num_agents": 5,
    "waymo.max_num_road_polylines": 8,
    "waymo.max_num_road_pts_per_polyline": 10,
    "sim.steps": 14,
    "sim.history_steps": 4,
    "sim.max_agents": 5,
    "eval.history_steps": 4,
    "eval.interesting_traj_len_threshold": 5,
    "eval.rollout_mode": "exact",
}


@pytest.fixture(scope="module")
def setup():
    cfg = load_config(SMALL)
    scenes = [
        synthetic_scenario(cfg, seed=s, num_agents=4, arena_half=70.0,
                           num_lanes=2, invalid_tail_agents=0)
        for s in range(2)
    ]
    sb = stack_scenarios(scenes, cfg)
    sbj = Scenario(**{k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                      for k, v in dataclasses.asdict(sb).items()})
    model = CtRLSim(cfg)
    offline = generate_offline_data(cfg, sbj)
    tb = build_train_batch(cfg, jax.random.PRNGKey(0), sbj, offline)
    params = model.init({"params": jax.random.PRNGKey(0)}, tb)
    return cfg, model, params, scenes


def test_polyline_yaw_vel_match_reference():
    rng = np.random.default_rng(0)
    poly = np.cumsum(rng.normal(size=(20, 2)), axis=0)

    # reference port (utils/sim.py:198-222)
    def ref_yaw(polyline):
        post = np.roll(polyline, shift=-1, axis=0)
        diff = post - polyline
        yaw = np.arctan2(diff[:, 1], diff[:, 0])
        yaw[-1] = yaw[-2]
        for i in range(len(yaw) - 1):
            if yaw[i + 1] - yaw[i] > 1.5 * np.pi:
                yaw[i + 1] -= 2 * np.pi
            elif yaw[i] - yaw[i + 1] > 1.5 * np.pi:
                yaw[i + 1] += 2 * np.pi
        interval = np.pad(yaw, 2, "edge")
        return np.convolve(interval, np.ones(5) / 5.0, "valid")

    np.testing.assert_allclose(polyline_yaw(poly), ref_yaw(poly), atol=1e-9)
    v = polyline_vel(poly)
    np.testing.assert_allclose(v[:-1], (poly[1:] - poly[:-1]) / 0.1, atol=1e-9)
    np.testing.assert_allclose(v[-1], 0.0, atol=1e-9)


def test_planner_adversary_eval(setup):
    cfg, model, params, scenes = setup
    ev = PlannerAdversaryEvaluator(
        cfg, model, params,
        planner_tilt=TiltConfig(goal_tilt=10.0, veh_veh_tilt=10.0, veh_edge_tilt=10.0),
        adversary_tilt=TiltConfig(veh_veh_tilt=-10.0),
    )
    metrics = ev.evaluate(scenes, pairs=[(1, 2), (1, 2)])
    assert metrics, "no metrics produced"
    for k, v in metrics.items():
        assert np.isfinite(v), k
    assert 0.0 <= metrics["ego_goal"] <= 1.0
    assert metrics["ego_prog"] >= 0.0


def test_planner_adversary_cat_replay(setup):
    cfg, model, params, scenes = setup
    # adversary replays a straight-line CAT trajectory
    T1 = scenes[0].traj_position.shape[1]
    adv = np.stack([np.linspace(0, 30, T1), np.linspace(0, 5, T1)], axis=-1)
    ev = PlannerAdversaryEvaluator(cfg, model, params)
    metrics = ev.evaluate(scenes, pairs=[(1, 2), (1, 2)],
                          adv_trajectories=[adv, None])
    assert metrics and np.isfinite(metrics["ego_ade"])


def test_make_adversarial_scenario(setup):
    cfg, _, _, scenes = setup
    T1 = scenes[0].traj_position.shape[1]
    adv = np.stack([np.linspace(0, 30, T1), np.zeros(T1)], axis=-1)
    out, focal = make_adversarial_scenario(scenes[0], 2, adv)
    np.testing.assert_allclose(out.traj_position[2], adv)
    assert focal == 2
    # other agents untouched
    np.testing.assert_allclose(out.traj_position[0], scenes[0].traj_position[0])


def test_finetuning_store_mixing(setup):
    cfg, model, params, scenes = setup
    real = ScenarioStore.from_scenes(cfg, scenes)
    T1 = scenes[0].traj_position.shape[1]
    adv = np.stack([np.linspace(0, 20, T1), np.linspace(0, 3, T1)], axis=-1)
    cat_scenes = []
    focal = []
    for s in scenes:
        out, f = make_adversarial_scenario(s, 1, adv)
        cat_scenes.append(out)
        focal.append(f)
    sim = ScenarioStore.from_scenes(cfg, cat_scenes)
    store = FinetuningStore(cfg, real, sim, np.asarray(focal))
    batch = store.sample_batch(jax.random.PRNGKey(0), 4)
    assert batch["agent_states"].shape[0] == 4
    # model consumes the finetuning batch
    from ctrl_sim_tpu.models.ctrl_sim import compute_loss

    preds = model.apply(params, batch, deterministic=True)
    losses = compute_loss(cfg, batch, preds)
    assert np.isfinite(float(losses.total))


def test_match_adversary_by_position():
    """CAT scenario matching (filter_valid_cat_scenarios.py:21-49): initial
    positions identify (sdc, adversary); sub-tolerance offsets break it."""
    from ctrl_sim_tpu.config import load_config
    from ctrl_sim_tpu.data.synthetic import synthetic_scenario
    from ctrl_sim_tpu.evals.cat import match_adversary_by_position

    cfg = load_config({"sim.max_agents": 6, "waymo.max_num_agents": 6})
    scene = synthetic_scenario(cfg, seed=3, num_agents=5)
    p = np.asarray(scene.traj_position)[:, 0]
    sdc_i, adv_i, ok = match_adversary_by_position(scene, p[2], p[4])
    assert ok and (sdc_i, adv_i) == (2, 4)
    # offset beyond tolerance -> no match
    _, _, ok2 = match_adversary_by_position(scene, p[2] + 0.5, p[4])
    assert not ok2
    # the reference's zero-position sentinel
    _, _, ok3 = match_adversary_by_position(scene, np.zeros(2), p[4])
    assert not ok3


def test_planner_streaming_normalization_guard(setup):
    """PlannerAdversaryEvaluator enforces the same train/eval frame guard as
    PolicyEvaluator (shared check_streaming_normalization): a streaming
    planner eval of a window-anchored config must be refused unless
    acknowledged."""
    import pytest

    from ctrl_sim_tpu.config import _set_dotted
    from ctrl_sim_tpu.evals.planner_adversary import PlannerAdversaryEvaluator

    cfg, model, params, scenes = setup
    bad = _set_dotted(cfg, "eval.rollout_mode", "streaming")
    with pytest.raises(ValueError, match="episode-start normalization"):
        PlannerAdversaryEvaluator(bad, model, params)
    ok = _set_dotted(bad, "eval.allow_normalization_mismatch", True)
    PlannerAdversaryEvaluator(ok, model, params)  # acknowledged: constructs
