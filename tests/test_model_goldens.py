"""Weight-transplant forward parity vs the EXECUTED reference torch model.

tests/goldens/reference_model.npz holds, per model family (ctrl_sim / dt /
il / trajeglish): every torch parameter, a synthetic input batch, and the
output logits of the reference Encoder+Decoder forward
(modules/encoder.py:50-178, modules/decoder.py:39-79) executed with torch.
Regenerate with tools/make_model_goldens.py.

These tests transplant the torch weights into the flax CtRLSim and assert
fp32 logit agreement — if the function computed at transplanted weights
matches, the architectures are the same, and training differences reduce to
optimizer/data-order noise (the strongest available predictor of BASELINE
config 4's learning-curve parity).

Also pins the closed-form multi-agent causal mask (ops/masks.py) to the
EXECUTED get_causal_mask (utils/train_utils.py:82-130), including the
full-size 32x24x3 training mask.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import load_config
from ctrl_sim_tpu.models.ctrl_sim import CtRLSim
from ctrl_sim_tpu.ops import masks

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "reference_model.npz")

HID, HEADS, FFN = 64, 4, 128
T, A, P, L = 4, 4, 6, 10


@pytest.fixture(scope="module")
def g():
    if not os.path.exists(GOLDENS):
        pytest.skip("reference_model.npz not generated")
    return np.load(GOLDENS)


def _cfg(family: str):
    return load_config(
        {
            "model.hidden_dim": HID,
            "model.num_heads": HEADS,
            "model.dim_feedforward": FFN,
            "model.num_transformer_encoder_layers": 2,
            "model.num_decoder_layers": 2,
            "model.predict_rtg": family == "ctrl_sim",
            "model.predict_future_states": family == "ctrl_sim",
            "model.decision_transformer": family == "dt",
            "model.il": family == "il",
            "model.trajeglish": family == "trajeglish",
            "model.compute_dtype": "float32",
            "model.use_flash_attention": False,
            "model.use_pallas_attention": False,
            "model.remat": False,
            "waymo.train_context_length": T,
            "waymo.max_num_agents": A,
            "waymo.max_num_road_polylines": P,
            "waymo.max_num_road_pts_per_polyline": L,
        }
    )


# ---------------------------------------------------------------------------
# torch -> flax weight conversion
# ---------------------------------------------------------------------------


def _lin(w, b):
    return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}


def _ln(w, b):
    return {"scale": jnp.asarray(w), "bias": jnp.asarray(b)}


class _W:
    """Name-checked accessor over the per-family torch tensors; tracks
    which tensors were consumed so the test can assert full coverage."""

    def __init__(self, g, family):
        self.pfx = f"{family}_w_"
        self.store = {
            k[len(self.pfx):]: g[k] for k in g.files if k.startswith(self.pfx)
        }
        self.used: set[str] = set()

    def __call__(self, name):
        self.used.add(name)
        return self.store[name]

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
        """torch nn.MultiheadAttention packed qkv -> separate projections."""
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
        p = f"transformer_encoder.layers.{i}"
        return {
            "self_attn": self.mha(f"{p}.self_attn"),
            "linear1": self.linear(f"{p}.linear1"),
            "linear2": self.linear(f"{p}.linear2"),
            "norm1": self.lnorm(f"{p}.norm1"),
            "norm2": self.lnorm(f"{p}.norm2"),
        }

    def dec_layer(self, i):
        p = f"dec.transformer_decoder.layers.{i}"
        return {
            "self_attn": self.mha(f"{p}.self_attn"),
            "cross_attn": self.mha(f"{p}.multihead_attn"),
            "linear1": self.linear(f"{p}.linear1"),
            "linear2": self.linear(f"{p}.linear2"),
            "norm1": self.lnorm(f"{p}.norm1"),
            "norm2": self.lnorm(f"{p}.norm2"),
            "norm3": self.lnorm(f"{p}.norm3"),
        }


def _build_params(g, family, cfg):
    w = _W(g, family)
    mc = cfg.model
    enc = {
        "map_encoder": {
            "map_seeds": jnp.asarray(w("map_encoder.map_seeds")),
            "road_pts_encoder": w.mlp("map_encoder.road_pts_encoder"),
            "road_pts_attn_layer": w.mha("map_encoder.road_pts_attn_layer"),
            "norm1": w.lnorm("map_encoder.norm1"),
            "norm2": w.lnorm("map_encoder.norm2"),
            "map_feats": w.mlp("map_encoder.map_feats"),
            "road_type_encoder": w.mlp("map_encoder.road_type_encoder"),
            "road_road_type_encoder": w.mlp("map_encoder.road_road_type_encoder"),
        },
        "embed_state": w.mlp("embed_state"),
        "embed_goal": w.mlp("embed_goal"),
        "embed_state_goal": w.linear("embed_state_goal"),
        "embed_action": w.embed("embed_action"),
        "embed_rtg": w.linear("embed_rtg"),
        "embed_timestep": w.embed("embed_timestep"),
        "embed_agent_id": w.embed("embed_agent_id"),
        "embed_ln": w.lnorm("embed_ln"),
    }
    if mc.decision_transformer:
        enc["embed_rtg_goal"] = w.linear("embed_rtg_goal")
        enc["embed_rtg_veh"] = w.linear("embed_rtg_veh")
        enc["embed_rtg_road"] = w.linear("embed_rtg_road")
    else:
        enc["embed_rtg_goal"] = w.embed("embed_rtg_goal")
        enc["embed_rtg_veh"] = w.embed("embed_rtg_veh")
        enc["embed_rtg_road"] = w.embed("embed_rtg_road")
    for i in range(mc.num_transformer_encoder_layers):
        enc[f"encoder_layer_{i}"] = w.enc_layer(i)

    dec = {"predict_action": w.mlp("dec.predict_action")}
    if mc.predict_rtg:
        dec["predict_rtg"] = w.mlp("dec.predict_rtg")
    if mc.predict_future_states:
        dec["predict_future_states"] = w.mlp("dec.predict_future_states")
    for i in range(mc.num_decoder_layers):
        dec[f"decoder_layer_{i}"] = w.dec_layer(i)

    unused = set(w.store) - w.used
    assert not unused, f"torch tensors not transplanted: {sorted(unused)}"
    return {"params": {"encoder": enc, "decoder": dec}}


def _batch(g, family):
    pfx = f"{family}_in_"
    b = {k[len(pfx):]: jnp.asarray(g[k]) for k in g.files if k.startswith(pfx)}
    b["timesteps"] = b["timesteps"][:, 0, :].astype(jnp.int32)  # [B, T]
    return b


@pytest.mark.parametrize("family", ["ctrl_sim", "dt", "il", "trajeglish"])
def test_forward_parity(g, family):
    cfg = _cfg(family)
    model = CtRLSim(cfg)
    params = _build_params(g, family, cfg)
    batch = _batch(g, family)

    # structure check against a fresh init (catches missing/extra modules)
    ref_tree = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, batch)
    )
    ref_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(ref_tree)}
    got_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert ref_paths == got_paths, (
        f"param-tree mismatch\nmissing: {sorted(ref_paths - got_paths)}\n"
        f"extra: {sorted(got_paths - ref_paths)}"
    )

    out = model.apply(params, batch)

    ref_action = g[f"{family}_out_action_preds"]
    np.testing.assert_allclose(
        np.asarray(out.action_preds), ref_action, atol=1e-4, rtol=1e-4
    )
    if f"{family}_out_rtg_preds" in g.files:
        np.testing.assert_allclose(
            np.asarray(out.rtg_preds), g[f"{family}_out_rtg_preds"],
            atol=1e-4, rtol=1e-4,
        )
    if f"{family}_out_state_preds" in g.files:
        np.testing.assert_allclose(
            np.asarray(out.state_preds), g[f"{family}_out_state_preds"],
            atol=1e-4, rtol=1e-4,
        )


@pytest.mark.slow
def test_forward_parity_full_size():
    """Executed-torch parity at the reference's REAL operating point
    (cfgs/model/base.yaml + ctrl_sim.yaml + cfgs/dataset/waymo/base.yaml):
    256-d, 8 heads, ffn 1024, 2+4 layers, 24 agents, 32-step context,
    200x100 road polylines. The reduced-dim goldens above exercise the same
    code path; this one pins the deployed shape, where layout/precision
    bugs would actually bite (VERDICT r4 item 6). Weights were f16-snapped
    before the torch forward (tools/make_model_goldens.py --full), so the
    f16 storage is lossless and both sides compute in f32 on identical
    weights."""
    path = os.path.join(
        os.path.dirname(__file__), "goldens", "reference_model_full.npz"
    )
    if not os.path.exists(path):
        pytest.skip("reference_model_full.npz not generated")
    gf = np.load(path)
    cfg = load_config(
        {
            "model.hidden_dim": 256,
            "model.num_heads": 8,
            "model.dim_feedforward": 1024,
            "model.num_transformer_encoder_layers": 2,
            "model.num_decoder_layers": 4,
            "model.compute_dtype": "float32",
            "model.use_flash_attention": False,
            "model.use_pallas_attention": False,
            "model.remat": False,
            "waymo.train_context_length": 32,
            "waymo.max_num_agents": 24,
            "waymo.max_num_road_polylines": 200,
            "waymo.max_num_road_pts_per_polyline": 100,
        }
    )
    model = CtRLSim(cfg)
    params = _build_params(gf, "full", cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    batch = _batch(gf, "full")
    out = model.apply(params, batch)
    np.testing.assert_allclose(
        np.asarray(out.action_preds), gf["full_out_action_preds"],
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out.rtg_preds), gf["full_out_rtg_preds"],
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out.state_preds), gf["full_out_state_preds"],
        atol=1e-4, rtol=1e-4,
    )


@pytest.mark.parametrize("family", ["ctrl_sim", "dt", "il", "trajeglish"])
def test_mask_matches_executed_reference(g, family):
    """The closed-form predicate equals the reference's executed
    get_causal_mask for every family layout (0 -> True, -inf -> False)."""
    cfg = _cfg(family)
    K = cfg.model.num_token_types
    ours = masks.multi_agent_causal_mask(
        T, A, K, state_index=cfg.model.state_token_index
    )
    ref = g[f"{family}_mask"] == 0
    np.testing.assert_array_equal(np.asarray(ours), ref)


def test_full_size_training_mask(g):
    ours = masks.multi_agent_causal_mask(32, 24, 3, state_index=0)
    np.testing.assert_array_equal(np.asarray(ours), g["mask_full_default"] == 0)


def test_strict_and_dt_mask_variants(g):
    strict = masks.multi_agent_causal_mask(
        4, 24, 3, state_index=0, attend_own_return_action=True
    )
    np.testing.assert_array_equal(np.asarray(strict), g["mask_small_strict"] == 0)
    dt = masks.multi_agent_causal_mask(4, 24, 3, state_index=1)
    np.testing.assert_array_equal(np.asarray(dt), g["mask_small_dt"] == 0)


# ---------------------------------------------------------------------------
# optimizer parity: executed configure_optimizers + create_lambda_lr
# ---------------------------------------------------------------------------


def test_lr_schedule_matches_executed_reference(g):
    """lr_schedule == lr * create_lambda_lr (utils/train_utils.py:5-12),
    executed with the reference's training config."""
    from ctrl_sim_tpu.training.trainer import lr_schedule

    cfg = load_config(
        {"train.warmup_steps": 500, "train.max_steps": 200_000,
         "train.lr": 5e-4}
    )
    sched = lr_schedule(cfg)
    for step, factor in zip(g["opt_lr_steps"], g["opt_lr_factors"]):
        ours = float(sched(jnp.asarray(int(step))))
        assert abs(ours - 5e-4 * float(factor)) < 1e-9, (step, ours, factor)


def _flax_leaf_kind(torch_name: str) -> str:
    """The transplant mapping's leaf kind for a torch parameter name
    (mirrors _W/_build_params): 'kernel' leaves get weight decay in our
    optax mask, everything else does not."""
    n = torch_name
    if n.endswith(".bias") or n.endswith("in_proj_bias"):
        return "bias"
    if n.endswith("map_seeds"):
        return "param"
    if n.endswith("in_proj_weight") or n.endswith("out_proj.weight"):
        return "kernel"
    if n.endswith(".weight"):
        mod = n.rsplit(".", 2)[-2] if ".mlp." in n else n.rsplit(".", 1)[0]
        if ".mlp." in n:
            # reference MLPLayer: Sequential [Linear, LayerNorm, ReLU, Linear]
            return "kernel" if mod in ("0", "3") else "scale"
        leaf_mod = mod.rsplit(".", 1)[-1]
        if leaf_mod.startswith("norm") or leaf_mod == "embed_ln":
            return "scale"
        if leaf_mod in ("linear1", "linear2", "embed_state_goal", "embed_rtg"):
            return "kernel"
        if leaf_mod.startswith("embed_"):
            return "embedding"  # nn.Embedding tables
    raise AssertionError(f"unmapped torch param {torch_name}")


def test_weight_decay_partition_matches_executed_reference(g):
    """The optax decay mask (kernels only, training/trainer.py:_decay_mask)
    partitions parameters exactly like the EXECUTED configure_optimizers
    (models/ctrl_sim.py:242-282): whitelist Linear/MultiheadAttention
    weights decay; biases, LayerNorms, Embeddings, learned seeds do not."""
    decay = {str(n) for n in g["opt_decay_names"]}
    no_decay = {str(n) for n in g["opt_no_decay_names"]}
    assert decay and no_decay and not (decay & no_decay)
    for name in decay | no_decay:
        kind = _flax_leaf_kind(name)
        ours_decays = kind == "kernel"
        ref_decays = name in decay
        assert ours_decays == ref_decays, (name, kind, ref_decays)
