"""GSPMD-sharded trainer for the CtRL-Sim model.

Replicates the reference's optimization recipe (models/ctrl_sim.py:242-282 +
cfgs/train/base.yaml): AdamW lr 5e-4, weight decay 1e-4 applied only to
linear/attention kernels (embeddings, LayerNorms and biases excluded — the
QCNet-style param grouping), 500-step linear warmup then linear decay to 0 at
200k steps, gradient clipping at global-norm 10.

Distribution: parameters replicated, batch sharded over the mesh ``data``
axis; ``jit`` inserts the gradient ``psum`` over ICI — the GSPMD equivalent
of the reference's DDP all-reduce (train.py:71-82).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.models.ctrl_sim import CtRLSim, LossDict, compute_loss
from ctrl_sim_tpu.parallel.mesh import MeshSpec

Array = jax.Array


class TrainState(NamedTuple):
    step: Array
    params: Any
    opt_state: Any


def lr_schedule(cfg: Config):
    """Linear warmup then linear decay (utils/train_utils.py:5-12)."""
    warmup, max_steps, lr = (
        cfg.train.warmup_steps,
        cfg.train.max_steps,
        cfg.train.lr,
    )

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup
        decay = jnp.maximum(0.0, (max_steps - step) / (max_steps - warmup))
        return lr * jnp.where(step < warmup, warm, decay)

    return schedule


def _decay_mask(params) -> Any:
    """True for params that receive weight decay: Dense/attention kernels.

    Mirrors the reference's whitelist/blacklist module grouping
    (models/ctrl_sim.py:244-259): Linear & MultiheadAttention weights decay;
    biases, LayerNorm scales, embeddings, learned seeds do not.
    """

    def mask_fn(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return name == "kernel"

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(cfg: Config, params) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.gradient_clip_val),
        optax.adamw(
            learning_rate=lr_schedule(cfg),
            weight_decay=cfg.train.weight_decay,
            mask=_decay_mask(params),
        ),
    )


class Trainer:
    """Owns the jitted, mesh-sharded train/eval steps."""

    def __init__(self, cfg: Config, mesh: MeshSpec | None = None):
        self.cfg = cfg
        self.mesh = mesh
        self.model = CtRLSim(cfg)

    # ------------------------------------------------------------------
    def init_state(self, rng: Array, sample_batch: dict) -> TrainState:
        params = self.model.init(
            {"params": rng}, sample_batch, deterministic=True
        )
        tx = make_optimizer(self.cfg, params)
        opt_state = tx.init(params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state)
        if self.mesh is not None:
            state = self.mesh.replicate(state)
        return state

    # ------------------------------------------------------------------
    def make_train_step(self):
        cfg = self.cfg
        model = self.model

        accum = max(cfg.train.accum_steps, 1)

        def train_step(state: TrainState, batch: dict, dropout_rng: Array):
            def loss_fn(params, microbatch, rng):
                preds = model.apply(
                    params, microbatch, deterministic=False, rngs={"dropout": rng}
                )
                losses = compute_loss(cfg, microbatch, preds)
                return losses.total, losses

            base_rng = jax.random.fold_in(dropout_rng, state.step)
            if accum == 1:
                grads, losses = jax.grad(loss_fn, has_aux=True)(
                    state.params, batch, base_rng
                )
            else:
                # microbatch gradient accumulation: [B] -> [accum, B/accum]
                def split(x):
                    return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

                micro = jax.tree.map(split, batch)

                def accum_body(carry, inp):
                    acc_grads, _ = carry
                    mb, i = inp
                    g, losses = jax.grad(loss_fn, has_aux=True)(
                        state.params, mb, jax.random.fold_in(base_rng, i)
                    )
                    acc_grads = jax.tree.map(jnp.add, acc_grads, g)
                    return (acc_grads, losses), None

                zero_grads = jax.tree.map(jnp.zeros_like, state.params)
                zero_losses = LossDict(*(jnp.zeros(()) for _ in LossDict._fields))
                (grads, losses), _ = jax.lax.scan(
                    accum_body,
                    (zero_grads, zero_losses),
                    (micro, jnp.arange(accum)),
                )
                grads = jax.tree.map(lambda g: g / accum, grads)

            tx = make_optimizer(cfg, state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (
                TrainState(step=state.step + 1, params=new_params, opt_state=new_opt),
                losses,
            )

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh.mesh, P())
            data = NamedSharding(self.mesh.mesh, P("data"))
            return jax.jit(
                train_step,
                in_shardings=(repl, data, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )
        return jax.jit(train_step, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def make_eval_step(self):
        cfg = self.cfg
        model = self.model

        def eval_step(state: TrainState, batch: dict) -> LossDict:
            preds = model.apply(state.params, batch, deterministic=True)
            return compute_loss(cfg, batch, preds)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh.mesh, P())
            data = NamedSharding(self.mesh.mesh, P("data"))
            return jax.jit(eval_step, in_shardings=(repl, data), out_shardings=repl)
        return jax.jit(eval_step)
