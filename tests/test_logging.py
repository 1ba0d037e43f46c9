"""Metrics sink + per-layer grad norms (reference train.py:50-60 WandbLogger
gate, models/ctrl_sim.py:231-238 on_before_optimizer_step grad norms)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.utils.logging import MetricsLogger, grad_norms

SMALL = {
    "model.hidden_dim": 32,
    "model.dim_feedforward": 64,
    "model.num_heads": 2,
    "model.num_decoder_layers": 1,
    "model.num_transformer_encoder_layers": 1,
    "model.compute_dtype": "float32",
    "waymo.train_context_length": 5,
    "waymo.max_num_agents": 4,
    "waymo.max_num_road_polylines": 8,
    "waymo.max_num_road_pts_per_polyline": 10,
    "sim.steps": 6,
    "sim.max_agents": 4,
}


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path), track=False)
    logger.log(1, {"loss": 0.5})
    logger.log(2, {"loss": jnp.asarray(0.25), "lr": 1e-4})
    logger.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[0]["step"] == 1 and rows[0]["loss"] == 0.5
    assert rows[1]["loss"] == 0.25 and "ts" in rows[1]


def test_grad_norms_payload():
    params = {"layer": {"kernel": jnp.ones((3, 4)), "bias": jnp.zeros(4)}}
    gn = jax.jit(grad_norms)(params)
    assert gn["grad_2.0_norm/layer/kernel"] == np.sqrt(12.0)
    assert gn["grad_2.0_norm/layer/bias"] == 0.0
    assert gn["grad_2.0_norm_total"] == np.sqrt(12.0)


@pytest.mark.slow  # train CLI ~100 s
def test_train_cli_writes_metrics_and_grad_norms(tmp_path):
    from ctrl_sim_tpu.train import main

    overrides = [f"{k}={v}" for k, v in SMALL.items()]
    main(
        [
            "--synthetic", "3", "--synthetic_agents", "3",
            "--steps", "2", "--log_every", "1", "--ckpt_every", "5",
            "--save_dir", str(tmp_path / "ckpt"),
        ]
        + [x for pair in (("-o", o) for o in overrides) for x in pair]
        + ["-o", "train.global_batch_size=4", "-o", "train.accum_steps=1",
           "-o", "train.log_grad_norms=true", "-o", "train.warmup_steps=2",
           "-o", "train.max_steps=2"]
    )
    rows = [json.loads(l) for l in open(tmp_path / "ckpt" / "metrics.jsonl")]
    assert len(rows) >= 2
    assert "total" in rows[0] and np.isfinite(rows[0]["total"])
    gn_keys = [k for k in rows[0] if k.startswith("grad_2.0_norm/")]
    assert len(gn_keys) > 5, rows[0].keys()
    assert np.isfinite(rows[0]["grad_2.0_norm_total"])
