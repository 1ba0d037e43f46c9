"""Weight-transplant parity for the CTG++ DiT social-attention layer vs the
EXECUTED reference RelativeSocialAttentionLayer (ctg_arch.py:48-193).

The reference computes edge-attention with torch-geometric MessagePassing
over an explicit edge list; the TPU re-design is dense masked attention
(models/ctg/dit.py:RelativeSocialAttention). tests/goldens/reference_dit.npz
holds the executed layer's weights/inputs/outputs
(tools/make_dit_goldens.py); this test transplants the weights and asserts
the dense form computes the same function.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.models.ctg.dit import RelativeSocialAttention

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "reference_dit.npz")

D_MODEL, NHEAD, FFN = 64, 4, 128


def _lin(g, name):
    return {
        "kernel": jnp.asarray(g[f"w_{name}.weight"].T),
        "bias": jnp.asarray(g[f"w_{name}.bias"]),
    }


def _ln(g, name):
    return {
        "scale": jnp.asarray(g[f"w_{name}.weight"]),
        "bias": jnp.asarray(g[f"w_{name}.bias"]),
    }


def test_social_attention_matches_executed_reference():
    if not os.path.exists(GOLDENS):
        pytest.skip("reference_dit.npz not generated")
    g = np.load(GOLDENS)

    params = {
        "params": {
            "lin_q_node": _lin(g, "lin_q_node"),
            "lin_k_node": _lin(g, "lin_k_node"),
            "lin_k_edge": _lin(g, "lin_k_edge"),
            "lin_v_node": _lin(g, "lin_v_node"),
            "lin_v_edge": _lin(g, "lin_v_edge"),
            "lin_self": _lin(g, "lin_self"),
            "lin_ih": _lin(g, "lin_ih"),
            "lin_hh": _lin(g, "lin_hh"),
            "out_proj": _lin(g, "out_proj"),
            "norm1": _ln(g, "norm1"),
            "norm2": _ln(g, "norm2"),
            "mlp_lin1": _lin(g, "mlp.0"),
            "mlp_lin2": _lin(g, "mlp.3"),
        }
    }
    # every reference tensor transplanted
    used = {"lin_q_node", "lin_k_node", "lin_k_edge", "lin_v_node",
            "lin_v_edge", "lin_self", "lin_ih", "lin_hh", "out_proj",
            "norm1", "norm2", "mlp.0", "mlp.3"}
    ref_names = {k[2:].rsplit(".", 1)[0] for k in g.files if k.startswith("w_")}
    assert ref_names == used, ref_names ^ used

    x = jnp.asarray(g["in_x"]).transpose(1, 0, 2)  # (N, B, H) -> [B, N, H]
    valid = ~jnp.asarray(g["in_pad"])  # True = attend
    N = x.shape[1]
    edge_emb = jnp.asarray(g["in_rel"]).reshape(x.shape[0], N, N, D_MODEL)

    layer = RelativeSocialAttention(
        num_heads=NHEAD, dim_feedforward=FFN, dropout=0.1, dtype=jnp.float32
    )
    out = layer.apply(params, x, edge_emb, valid, True)

    want = np.asarray(g["out"]).transpose(1, 0, 2)  # -> [B, N, H]
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-4, rtol=1e-4)
