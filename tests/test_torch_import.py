"""Reference-checkpoint import (ctrl_sim_tpu/utils/torch_import.py +
python -m ctrl_sim_tpu.import_checkpoint).

Builds a Lightning-style checkpoint from the executed-reference golden
tensors, runs the import CLI, restores the orbax checkpoint, and asserts
the imported model reproduces the reference's logits — the migration path
for users bringing trained reference models.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import pytest

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "reference_model.npz")


@pytest.mark.slow  # torch save + orbax round trip + forward: ~1 min/family
@pytest.mark.parametrize("family", ["ctrl_sim", "dt"])
def test_import_cli_round_trips_reference_weights(tmp_path, family):
    if not os.path.exists(GOLDENS):
        pytest.skip("reference_model.npz not generated")
    import torch

    from ctrl_sim_tpu import import_checkpoint
    from ctrl_sim_tpu.models.ctrl_sim import CtRLSim
    from ctrl_sim_tpu.training import Trainer
    from ctrl_sim_tpu.training.checkpoint import CheckpointManager
    from tests.test_model_goldens import _batch, _cfg

    g = np.load(GOLDENS)
    # golden names use '' for encoder and 'dec.' for decoder; the Lightning
    # state_dict uses 'encoder.' / 'decoder.'
    pfx = f"{family}_w_"
    state = {}
    for k in g.files:
        if not k.startswith(pfx):
            continue
        name = k[len(pfx):]
        if name.startswith("dec."):
            name = "decoder." + name[len("dec."):]
        else:
            name = "encoder." + name
        state[name] = torch.from_numpy(g[k])
    ckpt_path = tmp_path / "model.ckpt"
    torch.save({"state_dict": state}, ckpt_path)

    out_dir = tmp_path / "imported"
    family_flags = {
        "ctrl_sim": [],
        "dt": ["-o", "model.decision_transformer=true",
               "-o", "model.predict_rtg=false",
               "-o", "model.predict_future_states=false"],
    }[family]
    overrides = [
        *family_flags,
        "-o", "model.hidden_dim=64", "-o", "model.num_heads=4",
        "-o", "model.dim_feedforward=128",
        "-o", "model.num_transformer_encoder_layers=2",
        "-o", "model.num_decoder_layers=2",
        "-o", "model.compute_dtype=float32",
        "-o", "model.use_flash_attention=false",
        "-o", "model.use_pallas_attention=false", "-o", "model.remat=false",
        "-o", "waymo.train_context_length=4", "-o", "waymo.max_num_agents=4",
        "-o", "waymo.max_num_road_polylines=6",
        "-o", "waymo.max_num_road_pts_per_polyline=10",
    ]
    import_checkpoint.main(
        ["--torch", str(ckpt_path), "--out", str(out_dir), *overrides]
    )

    cfg = _cfg(family)
    model = CtRLSim(cfg)
    batch = _batch(g, family)
    trainer = Trainer(cfg)
    template = trainer.init_state(jax.random.PRNGKey(0), batch)
    restored = CheckpointManager(cfg, str(out_dir)).restore(template)

    out = model.apply(restored.params, batch)
    np.testing.assert_allclose(
        np.asarray(out.action_preds), g[f"{family}_out_action_preds"],
        atol=1e-4, rtol=1e-4,
    )


@pytest.mark.slow
def test_import_cli_ctg_plus_plus(tmp_path):
    """CTG++ Lightning layout (diff_model.model.* + rtg_model.* + schedule
    buffers) through the import CLI: the orbax round trip must restore
    exactly the parity-proven transplant (tests/test_ctg_golden.py)."""
    ctg_goldens = os.path.join(
        os.path.dirname(__file__), "goldens", "reference_ctg.npz"
    )
    if not os.path.exists(ctg_goldens):
        pytest.skip("reference_ctg.npz not generated")
    import torch

    from ctrl_sim_tpu import import_checkpoint
    from ctrl_sim_tpu.training.checkpoint import CheckpointManager
    from ctrl_sim_tpu.training.trainer import CTGTrainer
    from ctrl_sim_tpu.utils.torch_import import ctg_params_from_torch_state
    from tests.test_ctg_golden import _cfg, _cond

    g = np.load(ctg_goldens)
    state = {
        "diff_model.model." + k[len("gd_w_"):]: torch.from_numpy(g[k])
        for k in g.files if k.startswith("gd_w_")
    }
    state.update(
        {
            "rtg_model." + k[len("rtg_w_"):]: torch.from_numpy(g[k])
            for k in g.files if k.startswith("rtg_w_")
        }
    )
    for name in ("betas", "alphas_cumprod", "posterior_variance"):
        state["diff_model." + name] = torch.from_numpy(g["sched_" + name])
    ckpt_path = tmp_path / "ctg.ckpt"
    torch.save({"state_dict": state}, ckpt_path)

    out_dir = tmp_path / "imported"
    import_checkpoint.main(
        [
            "--torch", str(ckpt_path), "--out", str(out_dir),
            "--preset", "ctg_plus_plus",
            "-o", "model.hidden_dim=32", "-o", "model.num_heads=2",
            "-o", "model.dim_feedforward=64",
            "-o", "model.num_transformer_encoder_layers=2",
            "-o", "model.compute_dtype=float32",
            "-o", "model.n_diffusion_steps=20",
            "-o", "model.n_eval_diffusion_step=10",
            "-o", "model.use_rtg=false",
            "-o", "waymo.train_context_length=6",
            "-o", "waymo.input_horizon=3", "-o", "waymo.max_num_agents=4",
            "-o", "waymo.rtg_discretization=20",
        ]
    )

    cfg = _cfg(use_rtg=False)
    import jax.numpy as jnp

    cond = _cond(g)
    batch = dict(
        cond,
        agent_future_states=jnp.zeros((2, 4, 3, 6)),
        agent_future_actions=jnp.zeros((2, 4, 3, 2)),
    )
    trainer = CTGTrainer(cfg)
    template = trainer.init_state(jax.random.PRNGKey(0), batch)
    restored = CheckpointManager(cfg, str(out_dir)).restore(template)

    # use_rtg=false: the importer maps the denoiser and skips the RTG head
    # (the use_rtg=true layout is structure-checked in test_ctg_golden.py)
    state_np = {k: v.numpy() for k, v in state.items()}
    want = ctg_params_from_torch_state(state_np, cfg)
    assert "rtg_model" not in want["params"]
    assert "rtg_model" not in restored.params["params"]
    mismatch = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        restored.params["params"]["diffusion"],
        want["params"]["diffusion"],
    )
    assert max(jax.tree.leaves(mismatch)) == 0.0
