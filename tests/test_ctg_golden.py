"""Weight-transplant parity for the FULL CTG++ stack vs the EXECUTED
reference (tools/make_ctg_goldens.py):

- DiT denoiser forward (modules/ctg_arch.py:338-511), use_rtg=True;
- RTGModel forward (modules/rtg_model.py:24-166);
- the diffusion schedule constants and the strided p_sample_loop
  (modules/diffusion.py:145-186) replayed on the recorded torch noise
  stream (GaussianDiffusion.sample(noise_override=...)).

Round 3 pinned only the social layer (test_dit_golden.py); these tests give
CTG++ the same executed-reference treatment as the CtRL-Sim families.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import load_config
from ctrl_sim_tpu.models.ctg.diffusion import (
    DiffusionSchedule,
    GaussianDiffusion,
)
from ctrl_sim_tpu.models.ctg.dit import DiT, positional_encoding_table
from ctrl_sim_tpu.models.ctg.rtg_model import RTGModel

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "reference_ctg.npz")

B, N = 2, 4
T_IN, T_OUT = 3, 3
HID, HEADS, FFN = 32, 2, 64
RTG_DISC = 20
N_DIFF, N_EVAL = 20, 10
L_ENC = 2


@pytest.fixture(scope="module")
def g():
    if not os.path.exists(GOLDENS):
        pytest.skip("reference_ctg.npz not generated")
    return np.load(GOLDENS)


def _cfg(use_rtg: bool):
    return load_config(
        {
            "model.hidden_dim": HID,
            "model.num_heads": HEADS,
            "model.dim_feedforward": FFN,
            "model.num_transformer_encoder_layers": L_ENC,
            "model.compute_dtype": "float32",
            "model.n_diffusion_steps": N_DIFF,
            "model.n_eval_diffusion_step": N_EVAL,
            "model.use_rtg": use_rtg,
            "model.ctg_plus_plus": True,
            "waymo.train_context_length": T_IN + T_OUT,
            "waymo.input_horizon": T_IN,
            "waymo.max_num_agents": N,
            "waymo.rtg_discretization": RTG_DISC,
        }
    )


# ---------------------------------------------------------------------------
# torch -> flax weight conversion (same patterns as test_model_goldens.py)
# ---------------------------------------------------------------------------


def _lin(w, b):
    return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}


def _ln(w, b):
    return {"scale": jnp.asarray(w), "bias": jnp.asarray(b)}


class _W:
    def __init__(self, g, prefix, skip=()):
        self.store = {
            k[len(prefix):]: g[k] for k in g.files if k.startswith(prefix)
        }
        self.used: set[str] = set(
            n for n in self.store if any(n.startswith(s) for s in skip)
        )

    def __call__(self, name):
        self.used.add(name + ".weight")
        self.used.add(name + ".bias")
        return name

    def raw(self, name):
        self.used.add(name)
        return jnp.asarray(self.store[name])

    def linear(self, name):
        self(name)
        return _lin(self.store[name + ".weight"], self.store[name + ".bias"])

    def lnorm(self, name):
        self(name)
        return _ln(self.store[name + ".weight"], self.store[name + ".bias"])

    def embed(self, name):
        self.used.add(name + ".weight")
        return {"embedding": jnp.asarray(self.store[name + ".weight"])}

    def mlp(self, p):
        """reference utils/layers.py MLPLayer -> flax MLPLayer."""
        return {
            "Dense_0": self.linear(f"{p}.mlp.0"),
            "LayerNorm_0": self.lnorm(f"{p}.mlp.1"),
            "Dense_1": self.linear(f"{p}.mlp.3"),
        }

    def mha(self, p):
        """torch nn.MultiheadAttention packed qkv -> split projections."""
        self.used.add(f"{p}.in_proj_weight")
        self.used.add(f"{p}.in_proj_bias")
        w = self.store[f"{p}.in_proj_weight"]
        b = self.store[f"{p}.in_proj_bias"]
        H = w.shape[1]
        return {
            "q_proj": _lin(w[:H], b[:H]),
            "k_proj": _lin(w[H : 2 * H], b[H : 2 * H]),
            "v_proj": _lin(w[2 * H :], b[2 * H :]),
            "out_proj": self.linear(f"{p}.out_proj"),
        }

    def enc_layer(self, p):
        return {
            "self_attn": self.mha(f"{p}.self_attn"),
            "linear1": self.linear(f"{p}.linear1"),
            "linear2": self.linear(f"{p}.linear2"),
            "norm1": self.lnorm(f"{p}.norm1"),
            "norm2": self.lnorm(f"{p}.norm2"),
        }

    def social(self, p):
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
        """reference SingleInputEmbedding (ctg_arch.py:196-213)."""
        return {
            "Dense_0": self.linear(f"{p}.embed.0"),
            "LayerNorm_0": self.lnorm(f"{p}.embed.1"),
            "Dense_1": self.linear(f"{p}.embed.3"),
            "LayerNorm_1": self.lnorm(f"{p}.embed.4"),
            "Dense_2": self.linear(f"{p}.embed.6"),
            "LayerNorm_2": self.lnorm(f"{p}.embed.7"),
        }

    def map_encoder(self):
        p = "map_encoder"
        return {
            "road_pts_lin": self.linear(f"{p}.road_pts_lin.0"),
            "map_seeds": self.raw(f"{p}.map_seeds"),
            "road_pts_attn_layer": self.mha(f"{p}.road_pts_attn_layer"),
            "norm1": self.lnorm(f"{p}.norm1"),
            "norm2": self.lnorm(f"{p}.norm2"),
            "map_feats_lin1": self.linear(f"{p}.map_feats.0"),
            "map_feats_lin2": self.linear(f"{p}.map_feats.3"),
            "road_type_lin": self.linear(f"{p}.road_type_lin.0"),
            "road_pt_type_mlp_lin1": self.linear(f"{p}.road_pt_type_mlp.0"),
            "road_pt_type_mlp_lin2": self.linear(f"{p}.road_pt_type_mlp.3"),
        }

    def trunk(self):
        t = {}
        for i in range(L_ENC):
            for j in range(2):
                t[f"temporal_{i}_{j}"] = self.enc_layer(
                    f"temporal_attn_layers.{i}.layers.{j}"
                )
            t[f"social_{i}"] = self.social(f"social_attn_layers.{i}")
            t[f"map_attn_{i}"] = self.mha(f"map_attn_layers.{i}")
        return t

    def assert_all_used(self):
        unused = set(self.store) - self.used
        assert not unused, f"reference tensors not transplanted: {sorted(unused)}"


def _dit_params(w: _W, use_rtg: bool) -> dict:
    p = {
        "embed_state_action": w.mlp("embed_state_action"),
        "embed_goal": w.mlp("embed_goal"),
        "embed_timestep": w.embed("embed_timestep"),
        "embed_all_elements": w.mlp("embed_all_elements"),
        # the reference's attribute name has a typo: diffustion_
        "diffusion_step_encoder": w.mlp("diffustion_step_encoder"),
        "relative_encodings_encoder": w.sie("relative_encodings_encoder"),
        "map_encoder": w.map_encoder(),
        "trunk": w.trunk(),
        "output_mlp": w.mlp("output_mlp"),
    }
    if use_rtg:
        p["embed_rtg_goal"] = w.embed("embed_rtg_goal")
        p["embed_rtg_veh"] = w.embed("embed_rtg_veh")
        p["embed_rtg_road"] = w.embed("embed_rtg_road")
        p["embed_rtg"] = w.linear("embed_rtg")
    return p


def _cond(g) -> dict:
    return {
        "agent_past_states": jnp.asarray(g["in_agent_past_states"]),
        "agent_past_actions": jnp.asarray(g["in_agent_past_actions"]),
        "past_relative_encodings": jnp.asarray(g["in_agent_past_rel_encodings"]),
        "future_relative_encodings": jnp.asarray(
            g["in_agent_future_rel_encodings"]
        ),
        "agent_types": jnp.asarray(g["in_agent_types"]),
        "goals": jnp.asarray(g["in_goals"]),
        # reference timesteps [B, N, T, 1] hold one constant value
        # (dataset_ctg_plus_plus.py:331-333); our layout is [B, T]
        "timesteps": jnp.asarray(g["in_timesteps"][:, 0, :, 0]),
        "rtgs": jnp.asarray(g["in_rtgs"]),
        "road_points": jnp.asarray(g["in_road_points"]),
        "road_types": jnp.asarray(g["in_road_types"]),
        "moving_agent_mask": jnp.asarray(g["in_moving_agent_masks"]),
    }


def test_positional_table_matches_reference(g):
    """pos_encoder.pe is a frozen parameter in the reference; our closed-form
    table must reproduce it."""
    pe = g["dit_w_pos_encoder.pe"]  # [max_len, 1, H]
    ours = np.asarray(positional_encoding_table(pe.shape[0], pe.shape[2]))
    np.testing.assert_allclose(ours, pe[:, 0, :], atol=1e-6)


def test_dit_forward_matches_executed_reference(g):
    w = _W(g, "dit_w_", skip=("pos_encoder.pe",))
    params = {"params": _dit_params(w, use_rtg=True)}
    w.assert_all_used()

    model = DiT(_cfg(use_rtg=True))
    out = model.apply(
        params,
        jnp.asarray(g["in_future_k"]),
        _cond(g),
        jnp.asarray(g["in_diff_step"]),
        True,
    )
    np.testing.assert_allclose(
        np.asarray(out), g["dit_out"], atol=2e-4, rtol=1e-4
    )


@pytest.mark.slow
def test_dit_forward_full_size():
    """Executed-torch DiT parity at the reference's REAL operating point:
    256-d, 8 heads, ffn 1024, 2 encoder layers, 24 agents, horizon 10+22,
    200x100 per-agent road crops, 350 RTG bins (cfgs/model/base.yaml +
    ctg_plus_plus.yaml + cfgs/dataset/waymo/{base,ctg_plus_plus}.yaml).
    Weights and float inputs were f16-snapped before the torch forward
    (tools/make_ctg_goldens.py --full), so storage is lossless and both
    sides compute f32 on identical values (VERDICT r4 item 6)."""
    path = os.path.join(
        os.path.dirname(__file__), "goldens", "reference_ctg_full.npz"
    )
    if not os.path.exists(path):
        pytest.skip("reference_ctg_full.npz not generated")
    gf = np.load(path)
    cfg = load_config(
        {
            "model.hidden_dim": 256,
            "model.num_heads": 8,
            "model.dim_feedforward": 1024,
            "model.num_transformer_encoder_layers": L_ENC,
            "model.compute_dtype": "float32",
            "model.n_diffusion_steps": 100,
            "model.n_eval_diffusion_step": 50,
            "model.use_rtg": True,
            "model.ctg_plus_plus": True,
            "waymo.train_context_length": 32,
            "waymo.input_horizon": 10,
            "waymo.max_num_agents": 24,
            "waymo.rtg_discretization": 350,
        }
    )
    w = _W(gf, "dit_w_", skip=("pos_encoder.pe",))
    params = {"params": _dit_params(w, use_rtg=True)}
    w.assert_all_used()
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    model = DiT(cfg)
    out = model.apply(
        params,
        jnp.asarray(gf["in_future_k"], jnp.float32),
        {k: (jnp.asarray(v, jnp.float32) if v.dtype == np.float16 else v)
         for k, v in _cond(gf).items()},
        jnp.asarray(gf["in_diff_step"]),
        True,
    )
    np.testing.assert_allclose(
        np.asarray(out), gf["dit_out"], atol=5e-4, rtol=1e-4
    )


def test_rtg_model_matches_executed_reference(g):
    # the reference RTGModel *constructs* a diffusion-step encoder and the
    # positional table but never uses the former in forward
    # (rtg_model.py:62,131-166)
    w = _W(g, "rtg_w_", skip=("pos_encoder.pe", "diffustion_step_encoder."))
    params = {
        "params": {
            "embed_state_action": w.mlp("embed_state_action"),
            "embed_goal": w.mlp("embed_goal"),
            "embed_timestep": w.embed("embed_timestep"),
            "embed_all_elements": w.mlp("embed_all_elements"),
            "relative_encodings_encoder": w.sie("relative_encodings_encoder"),
            "map_encoder": w.map_encoder(),
            "trunk": w.trunk(),
            "predict_rtg": w.mlp("predict_rtg"),
        }
    }
    w.assert_all_used()

    model = RTGModel(_cfg(use_rtg=False))
    out = model.apply(params, _cond(g), True)
    np.testing.assert_allclose(
        np.asarray(out), g["rtg_out"], atol=2e-4, rtol=1e-4
    )


def test_schedule_constants_match(g):
    s = DiffusionSchedule.create(N_DIFF)
    for name in ("betas", "alphas_cumprod", "posterior_variance",
                 "posterior_log_variance_clipped", "posterior_mean_coef1",
                 "posterior_mean_coef2", "sqrt_alphas_cumprod",
                 "sqrt_one_minus_alphas_cumprod"):
        np.testing.assert_allclose(
            np.asarray(getattr(s, name)), g["sched_" + name],
            atol=1e-6, rtol=1e-5, err_msg=name,
        )


def test_ctg_importer_roundtrip(g):
    """ctg_params_from_torch_state maps a reference CTG++ Lightning state
    dict (diff_model.model.* + rtg_model.*) onto exactly the param tree a
    freshly-initialized CTGPlusPlus/RTGModel expects — structure and shapes.
    Uses the executed-reference weight dumps as the state dict."""
    from ctrl_sim_tpu.models.ctg_plus_plus import CTGPlusPlus
    from ctrl_sim_tpu.utils.torch_import import ctg_params_from_torch_state

    state = {
        "diff_model.model." + k[len("gd_w_"):]: g[k]
        for k in g.files
        if k.startswith("gd_w_")
    }
    rtg_state = {
        "rtg_model." + k[len("rtg_w_"):]: g[k]
        for k in g.files
        if k.startswith("rtg_w_")
    }
    # schedule buffers as a real checkpoint would carry them
    for name in ("betas", "alphas_cumprod", "posterior_variance"):
        state["diff_model." + name] = g["sched_" + name]

    # (a) shipped-default config (use_rtg=False): a checkpoint that carries
    # rtg_model.* anyway gets the head skipped (the target model has none)
    cfg = _cfg(use_rtg=False)
    mapped = ctg_params_from_torch_state(
        {**state, **rtg_state}, cfg, strict=True
    )
    assert "rtg_model" not in mapped["params"]

    # diffusion subtree must match a fresh CTGPlusPlus init exactly
    model = CTGPlusPlus(cfg)
    cond = _cond(g)
    batch = dict(
        cond,
        agent_future_states=jnp.zeros((B, N, T_OUT, 6)),
        agent_future_actions=jnp.zeros((B, N, T_OUT, 2)),
    )
    init = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1)
    )
    want = jax.tree.map(lambda x: x.shape, init["params"]["diffusion"])
    got = jax.tree.map(lambda x: x.shape, mapped["params"]["diffusion"])
    assert want == got

    # (b) use_rtg=True layout: the rtg subtree must match a fresh RTGModel
    # init exactly (the use_rtg DiT weights come from the dit_w_ dump)
    state_rtg = {
        "diff_model.model." + k[len("dit_w_"):]: g[k]
        for k in g.files
        if k.startswith("dit_w_")
    }
    mapped_rtg = ctg_params_from_torch_state(
        {**state_rtg, **rtg_state}, _cfg(use_rtg=True), strict=True
    )
    rtg_init = RTGModel(cfg).init({"params": jax.random.PRNGKey(0)}, cond, True)
    want = jax.tree.map(lambda x: x.shape, rtg_init["params"])
    got = jax.tree.map(lambda x: x.shape, mapped_rtg["params"]["rtg_model"])
    assert want == got


def test_p_sample_loop_matches_executed_reference(g):
    """Replay the recorded torch noise stream through our sampler: the final
    denoised futures must agree (10 compounding denoiser steps)."""
    w = _W(g, "gd_w_", skip=("pos_encoder.pe",))
    params = {"params": {"model": _dit_params(w, use_rtg=False)}}
    w.assert_all_used()

    gd = GaussianDiffusion(_cfg(use_rtg=False))
    noises = jnp.asarray(g["sample_noise"])  # [1 + N_EVAL, B, N, T_out, 7]
    out = gd.apply(
        params,
        _cond(g),
        jax.random.PRNGKey(0),
        method=lambda m, c, r: m.sample(
            c, r, noise_override=(noises[0], noises[1:])
        ),
    )
    np.testing.assert_allclose(
        np.asarray(out), g["sample_out"], atol=5e-4, rtol=1e-3
    )
