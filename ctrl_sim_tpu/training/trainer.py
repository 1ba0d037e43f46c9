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
    """Owns the jitted, mesh-sharded train/eval steps.

    Trajectory parity vs the executed reference loop (model + compute_loss +
    AdamW decay partition + LambdaLR + clip) is pinned by
    tests/test_training_parity.py. One documented semantics note: the
    reference hardwires torch's default dropout=0.1 in its transformer
    layers (encoder.py:42-46 / decoder.py:16-21 never pass dropout;
    cfg.model.dropout is ignored there), while this trainer wires
    model.dropout through — identical at the default 0.1, divergent only
    for non-default settings.
    """

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
    def make_grad_norm_fn(self):
        """Jitted per-parameter gradient 2-norms on a batch — the
        reference's on_before_optimizer_step payload
        (models/ctrl_sim.py:231-238). Called on log steps only, so the
        train step's signature stays (state, batch, rng) -> (state, losses)."""
        from ctrl_sim_tpu.utils.logging import grad_norms

        cfg = self.cfg
        model = self.model

        def fn(state: TrainState, batch: dict, rng: Array) -> dict:
            def loss_fn(params):
                preds = model.apply(
                    params, batch, deterministic=False, rngs={"dropout": rng}
                )
                return compute_loss(cfg, batch, preds).total

            grads = jax.grad(loss_fn)(state.params)
            return grad_norms(grads)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh.mesh, P())
            data = NamedSharding(self.mesh.mesh, P("data"))
            return jax.jit(fn, in_shardings=(repl, data, repl), out_shardings=repl)
        return jax.jit(fn)

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


class CTGTrainer:
    """GSPMD-sharded trainer for the CTG++ diffusion baseline.

    Optimization recipe from the reference (models/ctg_plus_plus.py:117-158 +
    cfgs/train/ctg_plus_plus.yaml): same AdamW decay grouping and
    warmup-linear-decay schedule as CtRL-Sim, lr 2e-4, gradient accumulation
    2 (the ``ctg_plus_plus`` preset sets both). Loss = weighted-L2 diffusion
    loss (+ optional RTGModel CE heads when model.use_rtg).
    """

    def __init__(self, cfg: Config, mesh: MeshSpec | None = None):
        from ctrl_sim_tpu.models.ctg_plus_plus import CTGPlusPlus

        self.cfg = cfg
        self.mesh = mesh
        self.model = CTGPlusPlus(cfg)

    # ------------------------------------------------------------------
    def init_state(self, rng: Array, sample_batch: dict) -> TrainState:
        from ctrl_sim_tpu.models.ctg_plus_plus import CTGPlusPlus

        k_params, k_diff = jax.random.split(rng)
        # init through the loss method (one denoiser forward), never through
        # __call__ (the 50-step sampling loop)
        params = self.model.init(
            {"params": k_params, "dropout": k_params},
            sample_batch,
            k_diff,
            method=CTGPlusPlus.loss,
        )
        tx = make_optimizer(self.cfg, params)
        opt_state = tx.init(params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state
        )
        if self.mesh is not None:
            state = self.mesh.replicate(state)
        return state

    # ------------------------------------------------------------------
    def make_train_step(self):
        from ctrl_sim_tpu.models.ctg_plus_plus import CTGLossDict, CTGPlusPlus

        cfg = self.cfg
        model = self.model
        accum = max(cfg.train.accum_steps, 1)

        def train_step(state: TrainState, batch: dict, rng: Array):
            def loss_fn(params, microbatch, k):
                losses = model.apply(
                    params,
                    microbatch,
                    k,
                    method=CTGPlusPlus.loss,
                    rngs={"dropout": jax.random.fold_in(k, 1)},
                )
                return losses.total, losses

            base_rng = jax.random.fold_in(rng, state.step)
            if accum == 1:
                grads, losses = jax.grad(loss_fn, has_aux=True)(
                    state.params, batch, base_rng
                )
            else:
                def split(x):
                    return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

                micro = jax.tree.map(split, batch)

                def accum_body(carry, inp):
                    acc_grads, _ = carry
                    mb, i = inp
                    g, losses = jax.grad(loss_fn, has_aux=True)(
                        state.params, mb, jax.random.fold_in(base_rng, i)
                    )
                    return (jax.tree.map(jnp.add, acc_grads, g), losses), None

                zero_grads = jax.tree.map(jnp.zeros_like, state.params)
                zero_losses = CTGLossDict(
                    *(jnp.zeros(()) for _ in CTGLossDict._fields)
                )
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
                TrainState(
                    step=state.step + 1, params=new_params, opt_state=new_opt
                ),
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
        """Validation: sampled-future state/action MSE — the reference's
        checkpoint-selection metric (models/ctg_plus_plus.py:79-107)."""
        from ctrl_sim_tpu.models.ctg_plus_plus import CTGPlusPlus

        model = self.model

        def eval_step(state: TrainState, batch: dict, rng: Array) -> dict:
            return model.apply(
                state.params, batch, rng, method=CTGPlusPlus.validation_mse
            )

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh.mesh, P())
            data = NamedSharding(self.mesh.mesh, P("data"))
            return jax.jit(
                eval_step, in_shardings=(repl, data, repl), out_shardings=repl
            )
        return jax.jit(eval_step)
