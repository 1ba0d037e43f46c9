"""Closed-loop policy evaluation entry point (reference: eval_sim.py).

  python -m ctrl_sim_tpu.eval_sim --ckpt checkpoints --data_dir /data/test \
      -o eval.eval_mode=multi_agent -o policy.tilt.goal_tilt=10
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import jax
import numpy as np

from ctrl_sim_tpu.config import _set_dotted, load_config, preset
from ctrl_sim_tpu.data.scenario import load_scenario_json
from ctrl_sim_tpu.data.synthetic import synthetic_scenario
from ctrl_sim_tpu.evals.evaluator import PolicyEvaluator
from ctrl_sim_tpu.train import parse_overrides
from ctrl_sim_tpu.training import Trainer
from ctrl_sim_tpu.training.checkpoint import CheckpointManager


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="ctrl_sim")
    p.add_argument("-o", "--override", action="append", default=[])
    p.add_argument("--ckpt", default=None, help="checkpoint directory")
    p.add_argument("--ckpt_step", type=int, default=None,
                   help="restore this saved step instead of the latest "
                        "(learning-curve evals)")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--limit_files", type=int, default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--synthetic_agents", type=int, default=12)
    p.add_argument("--synthetic_conflict", type=int, default=0)
    p.add_argument("--synthetic_seed0", type=int, default=0,
                   help="first synthetic scene seed (held-out evals use an "
                        "offset disjoint from the training corpus seeds)")
    p.add_argument("--lane_batch", type=int, default=32)
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

    # init params (template), then restore checkpoint when provided
    from ctrl_sim_tpu.data.store import ScenarioStore
    from ctrl_sim_tpu.training import CTGTrainer

    is_ctg = cfg.model.ctg_plus_plus
    family = "ctg_plus_plus" if is_ctg else "ctrl_sim"
    store = ScenarioStore.from_scenes(cfg, scenes[: min(4, len(scenes))])
    sample = store.sample_batch(jax.random.PRNGKey(0), 2, family=family)
    trainer = (CTGTrainer if is_ctg else Trainer)(cfg)
    model = trainer.model
    state = trainer.init_state(jax.random.PRNGKey(0), sample)
    if args.ckpt:
        # the checkpoint's snapshotted config records the training
        # normalization frame; it, not the eval-time flag, defines the
        # distribution the model was trained on
        from ctrl_sim_tpu.evals.evaluator import check_checkpoint_normalization

        check_checkpoint_normalization(cfg, args.ckpt)
        mgr = CheckpointManager(cfg, args.ckpt)
        state = mgr.restore(state, step=args.ckpt_step)
        print(f"[eval] restored step {int(state.step)} from {args.ckpt}")

    evaluator = PolicyEvaluator(cfg, model, state.params, lane_batch=args.lane_batch)
    metrics = evaluator.evaluate(scenes)
    print(json.dumps(metrics, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=2)
        print(f"[eval] wrote {args.out}")


if __name__ == "__main__":
    main()
