"""Controllability demo: steer a trained policy with exponential tilting.

Loads the committed round-5 checkpoint (artifacts/r05/ckpt_s0, 26k steps on
the collision-diverse synthetic corpus), rolls the same held-out scenes
under three veh-veh tilt settings, and prints the dose-response — the
CtRL-Sim headline behavior (policies/policy.py:108-142, paper Fig. 4):
positive tilts push the sampled return-to-go bins toward "high veh-veh
return" (safe, close-to-GT driving), negative tilts toward "low return"
(degraded, collision-adjacent driving).

Run (CPU, repo root, ~3 min):
    PYTHONPATH=. JAX_PLATFORMS=cpu python examples/tilt_control.py
"""

from __future__ import annotations

import os

import jax

jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

import jax.numpy as jnp  # noqa: E402

from ctrl_sim_tpu.config import load_config  # noqa: E402
from ctrl_sim_tpu.data.store import ScenarioStore  # noqa: E402
from ctrl_sim_tpu.data.synthetic import synthetic_scenario  # noqa: E402
from ctrl_sim_tpu.data.transforms import get_tilt_logits  # noqa: E402
from ctrl_sim_tpu.evals.evaluator import PolicyEvaluator  # noqa: E402
from ctrl_sim_tpu.training import Trainer  # noqa: E402
from ctrl_sim_tpu.training.checkpoint import CheckpointManager  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "artifacts", "r05", "ckpt_s0")

# the committed checkpoint's training shapes (see tools/make_r05_artifacts.py)
CFG = {
    "model.hidden_dim": 64, "model.dim_feedforward": 128,
    "model.num_heads": 4, "model.num_transformer_encoder_layers": 1,
    "model.num_decoder_layers": 2, "model.compute_dtype": "float32",
    "waymo.train_context_length": 8, "waymo.max_num_agents": 8,
    "waymo.max_num_road_polylines": 24,
    "waymo.max_num_road_pts_per_polyline": 20,
    "sim.steps": 40, "sim.max_agents": 8,
    "waymo.episode_start_normalization": True,
    "eval.rollout_mode": "streaming",
}


def main() -> None:
    cfg = load_config(CFG)
    scenes = [
        synthetic_scenario(cfg, seed=2000 + s, num_agents=8)
        for s in range(16)
    ]

    store = ScenarioStore.from_scenes(cfg, scenes[:2])
    sample = store.sample_batch(jax.random.PRNGKey(0), 2)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0), sample)
    state = CheckpointManager(cfg, CKPT).restore(state)
    print(f"restored step {int(state.step)} from {CKPT}")

    ev = PolicyEvaluator(cfg, tr.model, state.params, lane_batch=16)
    print(f"{'veh_veh_tilt':>12s} {'goal':>6s} {'CR':>7s} {'ADE':>6s}")
    for tilt in (-50.0, 0.0, 10.0):
        # one compiled program serves every tilt (it is a jit argument)
        ev.tilt_logits = jnp.asarray(get_tilt_logits(0.0, tilt, 0.0, cfg.waymo))
        m = ev.evaluate(scenes)
        print(f"{tilt:12.0f} {m['goal']:6.3f} {m['collision_rate']:7.4f} "
              f"{m['ade']:6.3f}")
    print("negative tilt -> the policy degrades monotonically; "
          "positive -> tighter, safer driving (Fig-4 semantics)")


if __name__ == "__main__":
    main()
