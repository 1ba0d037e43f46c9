"""Adversarial scenario generation: make a tilted agent attack the planner.

The third CtRL-Sim headline workflow (after log replay and tilt steering):
pick an (ego, adversary) pair per scene, drive the ego with the positively
tilted planner policy and the adversary with a NEGATIVELY veh-veh-tilted
policy — the exponential tilt re-weights its sampled return-to-go toward
"collide" outcomes, so the same model that drives safely becomes the attack
generator (reference: evaluators/planner_adversary_evaluator.py:134-152,
cfgs/policy/ctrl_sim_adversary.yaml; the CAT fine-tuning loop consumes the
resulting collision scenes via data/finetune.py).

Loads the committed round-5 checkpoint and evaluates crossing-course
conflict scenes at the reference's adversary tilt (-10) and a stronger one
(-50), printing the Table-2 safety metrics: ego collision rate WITH the
adversary specifically, the adversary's speed at impact, and its
distribution shift (JSDs vs ground truth).

Run (CPU, repo root, ~3 min):
    PYTHONPATH=. JAX_PLATFORMS=cpu python examples/adversarial_scenarios.py
"""

from __future__ import annotations

import os

import jax

jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

from ctrl_sim_tpu.config import TiltConfig, load_config  # noqa: E402
from ctrl_sim_tpu.data.store import ScenarioStore  # noqa: E402
from ctrl_sim_tpu.data.synthetic import synthetic_scenario  # noqa: E402
from ctrl_sim_tpu.evals.planner_adversary import (  # noqa: E402
    PlannerAdversaryEvaluator,
)
from ctrl_sim_tpu.training import Trainer  # noqa: E402
from ctrl_sim_tpu.training.checkpoint import CheckpointManager  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "artifacts", "r05", "ckpt_s0")

# the committed checkpoint's training shapes (see tools/make_r05_artifacts.py)
# + the planner-adversary knobs: conflict scenes are 40 steps, so the
# "interesting pair" thresholds relax from their Waymo-episode-scale defaults
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
    "eval.interesting_traj_len_threshold": 20,
    "eval.interesting_timestep_diff_threshold": 5,
    "eval.interesting_goal_dist_threshold": 1000.0,
}


def main() -> None:
    cfg = load_config(CFG)
    # crossing-course conflict pairs give the adversary something to hit
    scenes = [
        synthetic_scenario(cfg, seed=3000 + s, num_agents=8, conflict_pairs=2)
        for s in range(16)
    ]

    store = ScenarioStore.from_scenes(cfg, scenes[:2])
    sample = store.sample_batch(jax.random.PRNGKey(0), 2)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0), sample)
    state = CheckpointManager(cfg, CKPT).restore(state)
    print(f"restored step {int(state.step)} from {CKPT}")

    print(f"{'adversary tilt':>14s} {'ego CR w/adv':>12s} "
          f"{'adv impact m/s':>14s} {'adv lin JSD':>11s}")
    for tilt in (-10.0, -50.0):
        ev = PlannerAdversaryEvaluator(
            cfg, tr.model, state.params,
            adversary_tilt=TiltConfig(veh_veh_tilt=tilt), lane_batch=16,
        )
        m = ev.evaluate(scenes)
        print(f"{tilt:14.0f} {m['ego_cr_w_adv']:12.3f} "
              f"{m['adv_coll_speed']:14.2f} {m['adv_lin_jsd']:11.3f}")
    print("the negatively tilted adversary collides with the ego at speed; "
          "feed the collision scenes to data/finetune.py (CAT mixing) to "
          "harden the planner")


if __name__ == "__main__":
    main()
