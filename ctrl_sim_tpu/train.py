"""Training entry point: ``python -m ctrl_sim_tpu.train``.

The reference's train.py (Hydra CLI, Lightning DDP over 4 GPUs). Here:
argparse + dotted config overrides, GSPMD over all visible devices, orbax
checkpointing with auto-resume, periodic validation.

Examples:
  # offline-RL training on a directory of scenario JSONs
  python -m ctrl_sim_tpu.train --data_dir /data/offline_rl/train \
      --val_dir /data/offline_rl/val --steps 200000

  # smoke-train on synthetic scenes
  python -m ctrl_sim_tpu.train --synthetic 64 --steps 200 \
      -o model.hidden_dim=64 -o train.global_batch_size=16

  # model-family presets
  python -m ctrl_sim_tpu.train --preset dt --synthetic 64 --steps 100
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ctrl_sim_tpu.config import Config, load_config, preset
from ctrl_sim_tpu.data.store import ScenarioStore
from ctrl_sim_tpu.data.synthetic import synthetic_scenario
from ctrl_sim_tpu.parallel import make_mesh
from ctrl_sim_tpu.training import CTGTrainer, Trainer
from ctrl_sim_tpu.training.checkpoint import CheckpointManager


def parse_overrides(pairs: list[str]) -> dict:
    out = {}
    for pair in pairs:
        key, _, value = pair.partition("=")
        try:
            parsed = json.loads(value)
        except json.JSONDecodeError:
            parsed = value
        out[key] = parsed
    return out


def build_store(cfg: Config, args) -> ScenarioStore:
    if args.data_dir:
        return ScenarioStore.from_json_dir(cfg, args.data_dir, limit=args.limit_files)
    scenes = [
        synthetic_scenario(
            cfg, seed=s, num_agents=args.synthetic_agents,
            conflict_pairs=args.synthetic_conflict,
        )
        for s in range(args.synthetic)
    ]
    return ScenarioStore.from_scenes(cfg, scenes)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="ctrl_sim")
    p.add_argument("-o", "--override", action="append", default=[])
    p.add_argument("--data_dir", default=None)
    p.add_argument("--val_dir", default=None)
    p.add_argument("--limit_files", type=int, default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic scenes when no data_dir")
    p.add_argument("--synthetic_agents", type=int, default=12)
    p.add_argument("--synthetic_conflict", type=int, default=0,
                   help="crossing-course agent pairs per synthetic scene "
                        "(collision-diverse corpus for RTG tilting)")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--save_dir", default=None)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--val_every", type=int, default=None)
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() for multi-host")
    args = p.parse_args(argv)

    if args.distributed:
        jax.distributed.initialize()

    cfg = preset(args.preset)
    overrides = parse_overrides(args.override)
    if args.steps:
        overrides["train.max_steps"] = args.steps
    for key, value in overrides.items():
        from ctrl_sim_tpu.config import _set_dotted

        cfg = _set_dotted(cfg, key, value)

    mesh = make_mesh()
    n_dev = len(jax.devices())
    batch_size = cfg.train.global_batch_size
    if batch_size % n_dev != 0:
        batch_size = max(n_dev, batch_size - batch_size % n_dev)
        print(f"[train] rounding global batch to {batch_size} for {n_dev} devices")

    print(f"[train] devices={n_dev} batch={batch_size} preset={args.preset}")
    store = build_store(cfg, args)
    print(f"[train] store: {store.num_scenes} scenes")
    val_store = None
    if args.val_dir:
        val_store = ScenarioStore.from_json_dir(cfg, args.val_dir, limit=args.limit_files)

    is_ctg = cfg.model.ctg_plus_plus
    family = "ctg_plus_plus" if is_ctg else "ctrl_sim"
    trainer = (CTGTrainer if is_ctg else Trainer)(cfg, mesh=mesh)
    key = jax.random.PRNGKey(cfg.train.seed)
    key, k_init, k_data = jax.random.split(key, 3)
    sample = store.sample_batch(k_data, batch_size, family=family)
    state = trainer.init_state(k_init, sample)

    save_dir = args.save_dir or cfg.train.save_dir
    mgr = CheckpointManager(cfg, save_dir)
    if mgr.latest_step() is not None:
        print(f"[train] resuming from step {mgr.latest_step()}")
        state = mgr.restore(state)

    from ctrl_sim_tpu.utils.logging import MetricsLogger

    logger = MetricsLogger(save_dir, track=cfg.train.track, config=cfg)
    train_step = trainer.make_train_step()
    eval_step = trainer.make_eval_step()
    grad_norm_fn = (
        trainer.make_grad_norm_fn()
        if (cfg.train.log_grad_norms and not is_ctg)
        else None
    )

    t0 = time.time()
    dropout_key = jax.random.PRNGKey(cfg.train.seed + 1)
    step = int(state.step)
    while step < cfg.train.max_steps:
        key, k_batch = jax.random.split(key)
        batch = store.sample_batch(k_batch, batch_size, family=family)
        batch = mesh.shard_batch(batch)
        state, losses = train_step(state, batch, dropout_key)
        step += 1
        if step % args.log_every == 0:
            total = float(losses.total)
            dt = time.time() - t0
            t0 = time.time()
            row = {k: float(v) for k, v in losses._asdict().items()}
            row["steps_per_sec"] = args.log_every / dt
            if grad_norm_fn is not None:
                gn = grad_norm_fn(state, batch, dropout_key)
                row.update({k: float(v) for k, v in gn.items()})
            logger.log(step, row)
            if is_ctg:
                print(
                    f"[train] step={step} loss={total:.4f} "
                    f"diffusion={float(losses.diffusion_loss):.4f} "
                    f"a0={float(losses.a0_loss):.4f} "
                    f"rtg={float(losses.rtg_goal):.4f}/"
                    f"{float(losses.rtg_veh):.4f}/"
                    f"{float(losses.rtg_road):.4f} "
                    f"steps/s={args.log_every / dt:.2f}"
                )
            else:
                print(
                    f"[train] step={step} loss={total:.4f} "
                    f"actions={float(losses.loss_actions):.4f} "
                    f"rtg={float(losses.loss_rtg_goal):.4f}/"
                    f"{float(losses.loss_rtg_veh):.4f}/"
                    f"{float(losses.loss_rtg_road):.4f} "
                    f"state={float(losses.loss_state):.4f} "
                    f"steps/s={args.log_every / dt:.2f}"
                )
        if args.val_every and val_store is not None and step % args.val_every == 0:
            key, k_val = jax.random.split(key)
            vb = mesh.shard_batch(val_store.sample_batch(k_val, batch_size, family=family))
            if is_ctg:
                key, k_mse = jax.random.split(key)
                vm = eval_step(state, vb, k_mse)
                # checkpoint selection by state_mse (train.py:38-46 monitor)
                val_metric = float(vm["state_mse"])
                print(f"[val] step={step} state_mse={val_metric:.4f} "
                      f"action_mse={float(vm['action_mse']):.4f}")
            else:
                vl = eval_step(state, vb)
                val_metric = float(vl.total)
                print(f"[val] step={step} val_loss={val_metric:.4f}")
            logger.log(step, {"val_loss": val_metric})
            mgr.save(step, jax.device_get(state), metrics={"val_loss": val_metric})
        elif step % args.ckpt_every == 0:
            mgr.save(step, jax.device_get(state))
    mgr.save(step, jax.device_get(state))
    mgr.wait()
    logger.close()
    print(f"[train] done at step {step}; checkpoints in {save_dir}")


if __name__ == "__main__":
    main()
