"""Import reference torch checkpoints into the flax CtRL-Sim model.

The weight-transplant mapping proven by tests/test_model_goldens.py
(forward parity <= 1e-4 against the executed reference for all four model
families), promoted to a product feature: a user of the reference can bring
a trained Lightning checkpoint (models/ctrl_sim.py state_dict) and keep
evaluating/finetuning here.

    python -m ctrl_sim_tpu.import_checkpoint \
        --torch model.ckpt --out checkpoints/imported --preset ctrl_sim

Mapping (torch -> flax):
  Linear weight [out, in]      -> kernel [in, out] (transposed)
  LayerNorm weight/bias        -> scale/bias
  nn.Embedding weight          -> embedding
  MultiheadAttention packed
    in_proj_weight/bias        -> q_proj/k_proj/v_proj (+ out_proj)
  MLPLayer Sequential 0/1/3    -> Dense_0/LayerNorm_0/Dense_1
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from ctrl_sim_tpu.config import Config

Array = jnp.ndarray


def _lin(w, b):
    return {"kernel": jnp.asarray(np.asarray(w).T), "bias": jnp.asarray(np.asarray(b))}


def _ln(w, b):
    return {"scale": jnp.asarray(np.asarray(w)), "bias": jnp.asarray(np.asarray(b))}


class _W:
    """Name-checked accessor over a torch state dict; tracks consumption so
    the importer can assert full coverage."""

    def __init__(self, state: Mapping[str, np.ndarray]):
        self.store = dict(state)
        self.used: set[str] = set()

    def __call__(self, name):
        self.used.add(name)
        return np.asarray(self.store[name])

    def mlp(self, prefix):
        return {
            "Dense_0": _lin(self(f"{prefix}.mlp.0.weight"), self(f"{prefix}.mlp.0.bias")),
            "LayerNorm_0": _ln(self(f"{prefix}.mlp.1.weight"), self(f"{prefix}.mlp.1.bias")),
            "Dense_1": _lin(self(f"{prefix}.mlp.3.weight"), self(f"{prefix}.mlp.3.bias")),
        }

    def linear(self, prefix):
        return _lin(self(f"{prefix}.weight"), self(f"{prefix}.bias"))

    def lnorm(self, prefix):
        return _ln(self(f"{prefix}.weight"), self(f"{prefix}.bias"))

    def embed(self, prefix):
        return {"embedding": jnp.asarray(self(f"{prefix}.weight"))}

    def mha(self, prefix):
        w = self(f"{prefix}.in_proj_weight")
        b = self(f"{prefix}.in_proj_bias")
        H = w.shape[1]
        return {
            "q_proj": _lin(w[:H], b[:H]),
            "k_proj": _lin(w[H : 2 * H], b[H : 2 * H]),
            "v_proj": _lin(w[2 * H :], b[2 * H :]),
            "out_proj": self.linear(f"{prefix}.out_proj"),
        }

    def enc_layer(self, i):
        p = f"encoder.transformer_encoder.layers.{i}"
        return {
            "self_attn": self.mha(f"{p}.self_attn"),
            "linear1": self.linear(f"{p}.linear1"),
            "linear2": self.linear(f"{p}.linear2"),
            "norm1": self.lnorm(f"{p}.norm1"),
            "norm2": self.lnorm(f"{p}.norm2"),
        }

    def dec_layer(self, i):
        p = f"decoder.transformer_decoder.layers.{i}"
        return {
            "self_attn": self.mha(f"{p}.self_attn"),
            "cross_attn": self.mha(f"{p}.multihead_attn"),
            "linear1": self.linear(f"{p}.linear1"),
            "linear2": self.linear(f"{p}.linear2"),
            "norm1": self.lnorm(f"{p}.norm1"),
            "norm2": self.lnorm(f"{p}.norm2"),
            "norm3": self.lnorm(f"{p}.norm3"),
        }


def params_from_torch_state(
    state: Mapping[str, np.ndarray], cfg: Config, strict: bool = True
) -> dict:
    """Build the flax param tree for CtRLSim from a reference state dict
    (keys as in models/ctrl_sim.py: ``encoder.*`` / ``decoder.*``; a
    Lightning checkpoint's ``state_dict`` already has this layout)."""
    mc = cfg.model
    w = _W(state)
    enc = {
        "embed_state": w.mlp("encoder.embed_state"),
        "embed_goal": w.mlp("encoder.embed_goal"),
        "embed_state_goal": w.linear("encoder.embed_state_goal"),
        "embed_action": w.embed("encoder.embed_action"),
        "embed_rtg": w.linear("encoder.embed_rtg"),
        "embed_timestep": w.embed("encoder.embed_timestep"),
        "embed_agent_id": w.embed("encoder.embed_agent_id"),
        "embed_ln": w.lnorm("encoder.embed_ln"),
    }
    if mc.use_map:
        enc["map_encoder"] = {
            "map_seeds": jnp.asarray(w("encoder.map_encoder.map_seeds")),
            "road_pts_encoder": w.mlp("encoder.map_encoder.road_pts_encoder"),
            "road_pts_attn_layer": w.mha("encoder.map_encoder.road_pts_attn_layer"),
            "norm1": w.lnorm("encoder.map_encoder.norm1"),
            "norm2": w.lnorm("encoder.map_encoder.norm2"),
            "map_feats": w.mlp("encoder.map_encoder.map_feats"),
            "road_type_encoder": w.mlp("encoder.map_encoder.road_type_encoder"),
            "road_road_type_encoder": w.mlp(
                "encoder.map_encoder.road_road_type_encoder"
            ),
        }
    if mc.decision_transformer:
        enc["embed_rtg_goal"] = w.linear("encoder.embed_rtg_goal")
        enc["embed_rtg_veh"] = w.linear("encoder.embed_rtg_veh")
        enc["embed_rtg_road"] = w.linear("encoder.embed_rtg_road")
    else:
        enc["embed_rtg_goal"] = w.embed("encoder.embed_rtg_goal")
        enc["embed_rtg_veh"] = w.embed("encoder.embed_rtg_veh")
        enc["embed_rtg_road"] = w.embed("encoder.embed_rtg_road")
    for i in range(mc.num_transformer_encoder_layers):
        enc[f"encoder_layer_{i}"] = w.enc_layer(i)

    dec = {"predict_action": w.mlp("decoder.predict_action")}
    if mc.predict_rtg:
        dec["predict_rtg"] = w.mlp("decoder.predict_rtg")
    if mc.predict_future_states:
        dec["predict_future_states"] = w.mlp("decoder.predict_future_states")
    for i in range(mc.num_decoder_layers):
        dec[f"decoder_layer_{i}"] = w.dec_layer(i)

    unused = sorted(set(w.store) - w.used)
    if strict and unused:
        raise ValueError(f"torch tensors not mapped: {unused}")
    return {"params": {"encoder": enc, "decoder": dec}}


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a Lightning .ckpt (or raw state-dict .pt) into numpy arrays.
    CPU torch only; weights_only-safe."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}
