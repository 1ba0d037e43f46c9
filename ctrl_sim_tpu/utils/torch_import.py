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


    # ---- CTG++ building blocks (modules/ctg_arch.py / rtg_model.py) ----

    def social(self, p):
        """RelativeSocialAttentionLayer (ctg_arch.py:48-193)."""
        return {
            "lin_q_node": self.linear(f"{p}.lin_q_node"),
            "lin_k_node": self.linear(f"{p}.lin_k_node"),
            "lin_k_edge": self.linear(f"{p}.lin_k_edge"),
            "lin_v_node": self.linear(f"{p}.lin_v_node"),
            "lin_v_edge": self.linear(f"{p}.lin_v_edge"),
            "lin_self": self.linear(f"{p}.lin_self"),
            "lin_ih": self.linear(f"{p}.lin_ih"),
            "lin_hh": self.linear(f"{p}.lin_hh"),
            "out_proj": self.linear(f"{p}.out_proj"),
            "norm1": self.lnorm(f"{p}.norm1"),
            "norm2": self.lnorm(f"{p}.norm2"),
            "mlp_lin1": self.linear(f"{p}.mlp.0"),
            "mlp_lin2": self.linear(f"{p}.mlp.3"),
        }

    def sie(self, p):
        """SingleInputEmbedding (ctg_arch.py:196-213)."""
        return {
            "Dense_0": self.linear(f"{p}.embed.0"),
            "LayerNorm_0": self.lnorm(f"{p}.embed.1"),
            "Dense_1": self.linear(f"{p}.embed.3"),
            "LayerNorm_1": self.lnorm(f"{p}.embed.4"),
            "Dense_2": self.linear(f"{p}.embed.6"),
            "LayerNorm_2": self.lnorm(f"{p}.embed.7"),
        }

    def ctg_map_encoder(self, p):
        """MapEncoderPtsMA (ctg_arch.py:262-335)."""
        return {
            "road_pts_lin": self.linear(f"{p}.road_pts_lin.0"),
            "map_seeds": jnp.asarray(self(f"{p}.map_seeds")),
            "road_pts_attn_layer": self.mha(f"{p}.road_pts_attn_layer"),
            "norm1": self.lnorm(f"{p}.norm1"),
            "norm2": self.lnorm(f"{p}.norm2"),
            "map_feats_lin1": self.linear(f"{p}.map_feats.0"),
            "map_feats_lin2": self.linear(f"{p}.map_feats.3"),
            "road_type_lin": self.linear(f"{p}.road_type_lin.0"),
            "road_pt_type_mlp_lin1": self.linear(f"{p}.road_pt_type_mlp.0"),
            "road_pt_type_mlp_lin2": self.linear(f"{p}.road_pt_type_mlp.3"),
        }

    def ctg_enc_layer(self, p):
        return {
            "self_attn": self.mha(f"{p}.self_attn"),
            "linear1": self.linear(f"{p}.linear1"),
            "linear2": self.linear(f"{p}.linear2"),
            "norm1": self.lnorm(f"{p}.norm1"),
            "norm2": self.lnorm(f"{p}.norm2"),
        }

    def ctg_trunk(self, p, num_layers):
        t = {}
        for i in range(num_layers):
            for j in range(2):
                t[f"temporal_{i}_{j}"] = self.ctg_enc_layer(
                    f"{p}.temporal_attn_layers.{i}.layers.{j}"
                )
            t[f"social_{i}"] = self.social(f"{p}.social_attn_layers.{i}")
            t[f"map_attn_{i}"] = self.mha(f"{p}.map_attn_layers.{i}")
        return t

    def skip(self, *names):
        """Mark tensors consumed without mapping (frozen tables, buffers,
        modules the reference constructs but never calls)."""
        for k in list(self.store):
            if any(k == n or k.startswith(n) for n in names):
                self.used.add(k)


def _ctg_dit_params(w: _W, cfg: Config, p: str) -> dict:
    """DiT tree (ctg_arch.py:338-511) under torch prefix ``p``; parity
    proven by tests/test_ctg_golden.py."""
    mc = cfg.model
    out = {
        "embed_state_action": w.mlp(f"{p}.embed_state_action"),
        "embed_goal": w.mlp(f"{p}.embed_goal"),
        "embed_timestep": w.embed(f"{p}.embed_timestep"),
        "embed_all_elements": w.mlp(f"{p}.embed_all_elements"),
        # reference attribute name carries a typo: "diffustion_"
        "diffusion_step_encoder": w.mlp(f"{p}.diffustion_step_encoder"),
        "relative_encodings_encoder": w.sie(f"{p}.relative_encodings_encoder"),
        "map_encoder": w.ctg_map_encoder(f"{p}.map_encoder"),
        "trunk": w.ctg_trunk(p, mc.num_transformer_encoder_layers),
        "output_mlp": w.mlp(f"{p}.output_mlp"),
    }
    if mc.use_rtg:
        out["embed_rtg_goal"] = w.embed(f"{p}.embed_rtg_goal")
        out["embed_rtg_veh"] = w.embed(f"{p}.embed_rtg_veh")
        out["embed_rtg_road"] = w.embed(f"{p}.embed_rtg_road")
        out["embed_rtg"] = w.linear(f"{p}.embed_rtg")
    w.skip(f"{p}.pos_encoder.pe")  # frozen table, closed-form here
    return out


def ctg_params_from_torch_state(
    state: Mapping[str, np.ndarray], cfg: Config, strict: bool = True
) -> dict:
    """Build the flax param tree for CTGPlusPlus from a reference CTG++
    Lightning state dict (models/ctg_plus_plus.py: ``diff_model.model.*``
    for the DiT denoiser, ``rtg_model.*`` when predict_rtg)."""
    w = _W(state)
    params = {"diffusion": {"model": _ctg_dit_params(w, cfg, "diff_model.model")}}
    # the diffusion schedule buffers are recomputed bit-exactly
    # (tests/test_ctg_golden.py::test_schedule_constants_match)
    w.skip(
        "diff_model.betas", "diff_model.alphas_cumprod",
        "diff_model.sqrt_", "diff_model.log_one_minus",
        "diff_model.posterior_", "diff_model.loss_fn.",
    )
    has_rtg = any(k.startswith("rtg_model.") for k in w.store)
    if has_rtg and not cfg.model.use_rtg:
        # the checkpoint carries an RTG head but the target config disables
        # it (model.use_rtg=false -> CTGPlusPlus builds no rtg_model):
        # import the denoiser only
        print(
            "[import] note: checkpoint contains rtg_model.* but "
            "model.use_rtg=false — skipping the RTG head"
        )
        w.skip("rtg_model.")
    elif has_rtg:
        p = "rtg_model"
        w.skip(f"{p}.pos_encoder.pe", f"{p}.diffustion_step_encoder.")
        params["rtg_model"] = {
            "embed_state_action": w.mlp(f"{p}.embed_state_action"),
            "embed_goal": w.mlp(f"{p}.embed_goal"),
            "embed_timestep": w.embed(f"{p}.embed_timestep"),
            "embed_all_elements": w.mlp(f"{p}.embed_all_elements"),
            "relative_encodings_encoder": w.sie(
                f"{p}.relative_encodings_encoder"
            ),
            "map_encoder": w.ctg_map_encoder(f"{p}.map_encoder"),
            "trunk": w.ctg_trunk(p, cfg.model.num_transformer_encoder_layers),
            "predict_rtg": w.mlp(f"{p}.predict_rtg"),
        }
    unused = sorted(set(w.store) - w.used)
    if strict and unused:
        raise ValueError(f"torch tensors not mapped: {unused}")
    return {"params": params}


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
