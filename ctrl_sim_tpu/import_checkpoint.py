"""Import a reference torch checkpoint into this framework's format.

  python -m ctrl_sim_tpu.import_checkpoint \
      --torch /path/to/model.ckpt --out checkpoints/imported \
      --preset ctrl_sim [-o model.hidden_dim=256 ...]

Reads the Lightning checkpoint's state_dict — models/ctrl_sim.py layout for
the four CtRL-Sim families, models/ctg_plus_plus.py layout
(``diff_model.model.*`` + optional ``rtg_model.*``) when the preset sets
model.ctg_plus_plus — maps it through the parity-proven transplant
(ctrl_sim_tpu/utils/torch_import.py — forward agreement <= 1e-4,
tests/test_model_goldens.py + tests/test_ctg_golden.py), and writes an
orbax checkpoint + config snapshot that eval_sim / eval_planner /
train --ckpt consume directly.
"""

from __future__ import annotations

import argparse

import jax

from ctrl_sim_tpu.config import _set_dotted, preset
from ctrl_sim_tpu.train import parse_overrides
from ctrl_sim_tpu.utils.torch_import import (
    ctg_params_from_torch_state,
    load_torch_checkpoint,
    params_from_torch_state,
)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--torch", required=True, help="reference .ckpt / .pt path")
    p.add_argument("--out", required=True, help="orbax checkpoint directory")
    p.add_argument("--preset", default="ctrl_sim")
    p.add_argument("-o", "--override", action="append", default=[])
    args = p.parse_args(argv)

    cfg = preset(args.preset)
    for key, value in parse_overrides(args.override).items():
        cfg = _set_dotted(cfg, key, value)

    state_np = load_torch_checkpoint(args.torch)
    if cfg.model.ctg_plus_plus:
        params = ctg_params_from_torch_state(state_np, cfg)
    else:
        params = params_from_torch_state(state_np, cfg)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"[import] mapped {len(state_np)} torch tensors -> {n:,} params")

    # a fresh TrainState around the imported params (step 0, fresh optimizer)
    from ctrl_sim_tpu.training.checkpoint import CheckpointManager
    from ctrl_sim_tpu.training.trainer import TrainState, make_optimizer

    tx = make_optimizer(cfg, params)
    state = TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        opt_state=tx.init(params),
    )
    mgr = CheckpointManager(cfg, args.out)
    mgr.save(0, state, metrics={})
    mgr.wait()
    print(f"[import] wrote {args.out} (restore with --ckpt {args.out})")


if __name__ == "__main__":
    main()
