"""Planner-vs-adversary evaluation entry point (reference: eval_planner.py).

  python -m ctrl_sim_tpu.eval_planner --ckpt checkpoints --data_dir /data/test
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import jax

from ctrl_sim_tpu.config import TiltConfig, _set_dotted, preset
from ctrl_sim_tpu.data.scenario import load_scenario_json
from ctrl_sim_tpu.data.synthetic import synthetic_scenario
from ctrl_sim_tpu.evals.planner_adversary import PlannerAdversaryEvaluator
from ctrl_sim_tpu.models.ctrl_sim import CtRLSim
from ctrl_sim_tpu.train import parse_overrides
from ctrl_sim_tpu.training import Trainer
from ctrl_sim_tpu.training.checkpoint import CheckpointManager


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="ctrl_sim")
    p.add_argument("-o", "--override", action="append", default=[])
    p.add_argument("--ckpt", default=None)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--limit_files", type=int, default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--synthetic_agents", type=int, default=12)
    p.add_argument("--synthetic_conflict", type=int, default=0)
    p.add_argument("--synthetic_seed0", type=int, default=0,
                   help="first synthetic scene seed (held-out evals use an "
                        "offset disjoint from the training corpus seeds)")
    p.add_argument("--lane_batch", type=int, default=32)
    # planner/adversary tilts (cfgs/policy/ctrl_sim_planner|_adversary.yaml)
    p.add_argument("--planner_tilt", nargs=3, type=float, default=[10.0, 10.0, 10.0],
                   metavar=("GOAL", "VEH", "EDGE"))
    p.add_argument("--adversary_tilt", nargs=3, type=float, default=[0.0, -10.0, 0.0],
                   metavar=("GOAL", "VEH", "EDGE"))
    p.add_argument("--out", default=None, help="write the metrics JSON here")
    args = p.parse_args(argv)

    cfg = preset(args.preset)
    for key, value in parse_overrides(args.override).items():
        cfg = _set_dotted(cfg, key, value)

    if args.data_dir:
        files = sorted(glob.glob(os.path.join(args.data_dir, "*.json")))
        if args.limit_files:
            files = files[: args.limit_files]
        scenes = [load_scenario_json(f, cfg) for f in files]
    else:
        n = args.synthetic or 8
        scenes = [
            synthetic_scenario(
                cfg, seed=args.synthetic_seed0 + s,
                num_agents=args.synthetic_agents,
                conflict_pairs=args.synthetic_conflict,
            )
            for s in range(n)
        ]

    from ctrl_sim_tpu.data.store import ScenarioStore

    model = CtRLSim(cfg)
    store = ScenarioStore.from_scenes(cfg, scenes[: min(4, len(scenes))])
    sample = store.sample_batch(jax.random.PRNGKey(0), 2)
    state = Trainer(cfg).init_state(jax.random.PRNGKey(0), sample)
    if args.ckpt:
        from ctrl_sim_tpu.evals.evaluator import check_checkpoint_normalization

        check_checkpoint_normalization(cfg, args.ckpt)
        state = CheckpointManager(cfg, args.ckpt).restore(state)
        print(f"[eval_planner] restored step {int(state.step)}")

    pt = TiltConfig(goal_tilt=args.planner_tilt[0], veh_veh_tilt=args.planner_tilt[1],
                    veh_edge_tilt=args.planner_tilt[2])
    at = TiltConfig(goal_tilt=args.adversary_tilt[0], veh_veh_tilt=args.adversary_tilt[1],
                    veh_edge_tilt=args.adversary_tilt[2])
    evaluator = PlannerAdversaryEvaluator(
        cfg, model, state.params, planner_tilt=pt, adversary_tilt=at,
        lane_batch=args.lane_batch,
    )
    metrics = evaluator.evaluate(scenes)
    print(json.dumps(metrics, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=2)
        print(f"[eval] wrote {args.out}")


if __name__ == "__main__":
    main()
