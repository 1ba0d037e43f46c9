"""Training-trajectory parity vs the EXECUTED reference torch loop.

tools/make_training_parity.py ran the reference model + compute_loss +
AdamW (whitelist/blacklist decay partition) + LambdaLR warmup-linear-decay
+ grad-clip 10 (models/ctrl_sim.py:192-282, utils/train_utils.py:5-12,
train.py:80) for 200 steps from a recorded init on recorded batches.

Here the SAME init (weight transplant, forward parity already pinned by
test_model_goldens.py) and the SAME batches run through the JAX trainer
(training/trainer.py), and the loss trajectories + final weights must
agree within fp32 numerical drift — BASELINE config 4's "learning-curve
parity" as a deterministic statement, not a statistical one (dropout off
on both sides; with it on, parity holds only in distribution).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import load_config
from ctrl_sim_tpu.training.trainer import Trainer, TrainState, make_optimizer
from ctrl_sim_tpu.utils.torch_import import params_from_torch_state

GOLDENS = os.path.join(
    os.path.dirname(__file__), "goldens", "reference_training.npz"
)

HID, HEADS, FFN = 32, 2, 64
T, A = 4, 4
STEPS = 200


@pytest.fixture(scope="module")
def g():
    if not os.path.exists(GOLDENS):
        pytest.skip("reference_training.npz not generated")
    return np.load(GOLDENS)


def _cfg():
    return load_config(
        {
            "model.hidden_dim": HID,
            "model.num_heads": HEADS,
            "model.dim_feedforward": FFN,
            "model.num_transformer_encoder_layers": 2,
            "model.num_decoder_layers": 2,
            "model.compute_dtype": "float32",
            "model.dropout": 0.0,
            "model.goal_dropout": 0.0,
            "model.supervise_moving": True,
            "model.use_flash_attention": False,
            "model.use_pallas_attention": False,
            "model.remat": False,
            "waymo.train_context_length": T,
            "waymo.max_num_agents": A,
            "waymo.max_num_road_polylines": 6,
            "waymo.max_num_road_pts_per_polyline": 10,
            "train.lr": 5e-4,
            "train.weight_decay": 1e-4,
            "train.warmup_steps": 20,
            "train.max_steps": 200,
            "train.gradient_clip_val": 10.0,
            "train.accum_steps": 1,
        }
    )


@pytest.mark.slow
def test_loss_trajectory_matches_reference(g):
    cfg = _cfg()
    init_state_dict = {
        k[len("init_"):]: g[k] for k in g.files if k.startswith("init_")
    }
    params = params_from_torch_state(init_state_dict, cfg)

    trainer = Trainer(cfg)
    tx = make_optimizer(cfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )
    step_fn = jax.jit(trainer.make_train_step())

    keys = ["agent_states", "agent_types", "goals", "actions", "rtgs",
            "timesteps", "road_points", "road_types", "moving_agent_mask"]
    losses = []
    for i in range(STEPS):
        batch = {k: jnp.asarray(g[f"b{i}_{k}"]) for k in keys}
        # torch layout records timesteps [B, A, T]; ours is [B, T]
        batch["timesteps"] = batch["timesteps"][:, 0, :].astype(jnp.int32)
        state, m = step_fn(state, batch, jax.random.PRNGKey(0))
        losses.append(float(m.total))
    losses = np.asarray(losses)
    ref = g["loss"]

    # per-step agreement: fp32 reduction-order drift compounds through the
    # optimizer; bound it tightly early and loosely late
    np.testing.assert_allclose(losses[:20], ref[:20], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(losses, ref, rtol=5e-3, atol=5e-3)
    # trajectory-level: mean absolute relative deviation stays tiny
    rel = np.abs(losses - ref) / (np.abs(ref) + 1e-6)
    assert rel.mean() < 1e-3, rel.mean()

    # endpoint weights: the optimizer walked the same path
    final_ref = {
        k[len("final_"):]: g[k] for k in g.files if k.startswith("final_")
    }
    final_params = params_from_torch_state(final_ref, cfg)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, final_params
    )
    means = jax.tree.map(
        lambda a, b: float(jnp.mean(jnp.abs(a - b))), state.params, final_params
    )
    max_diff = max(jax.tree.leaves(diffs))
    mean_diff = float(np.mean(jax.tree.leaves(means)))
    # Adam normalizes each step to ~lr: where the true gradient is ~0, fp32
    # reduction-order noise can flip a step's sign entirely, so the endpoint
    # drift bound is a few lr-units on the worst single weight (measured
    # 2.6e-3 ~ 5 lr), while the mean drift stays orders below one lr
    assert max_diff < 5e-3, max_diff
    assert mean_diff < 5e-5, mean_diff
