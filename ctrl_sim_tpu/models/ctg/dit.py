"""CTG++ denoiser: AutoBots-style interleaved attention trunk.

flax re-build of modules/ctg_arch.py — temporal attention per agent over
time (with sinusoidal positional encoding), relative social attention
(edge-feature-biased attention with a gated update; the reference's
torch-geometric MessagePassing over a dense N x N graph becomes a dense
masked attention — identical math, no scatter), per-agent map
cross-attention, and a sinusoidal diffusion-step embedding, ending in an MLP
that emits per-future-step (state 5 + action 2).

The trunk (``DiTTrunk``) is shared with the RTGModel (modules/rtg_model.py
instantiates the same layer kinds).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.models.layers import (
    Embed,
    MLPLayer,
    MultiHeadAttention,
    TransformerEncoderLayer,
    _dense,
    layer_norm,
)

Array = jax.Array


def sinusoidal_pos_emb(x: Array, dim: int) -> Array:
    """SinusoidalPosEmb (utils/diffusion_helpers.py:15-27)."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half) * (-math.log(10000.0) / (half - 1)))
    emb = x[..., None] * freqs
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def positional_encoding_table(max_len: int, d_model: int) -> Array:
    """Fixed sin/cos positional table (ctg_arch.py:29-45)."""
    position = jnp.arange(max_len)[:, None].astype(jnp.float32)
    div = jnp.exp(
        jnp.arange(0, d_model, 2).astype(jnp.float32)
        * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((max_len, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe


class SingleInputEmbedding(nn.Module):
    """3x (Linear-LN-ReLU) + final LN (ctg_arch.py:196-213)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for _ in range(2):
            x = _dense(self.out_dim, self.dtype)(x)
            x = layer_norm(self.dtype)(x)
            x = nn.relu(x)
        x = _dense(self.out_dim, self.dtype)(x)
        return layer_norm(self.dtype)(x)


class RelativeSocialAttention(nn.Module):
    """Edge-feature-biased dense attention with gated update
    (ctg_arch.py:48-193).

    For target i over sources j (full graph incl. self, masked by validity):
      alpha_ij = softmax_j( q_i . (k_node_j + k_edge_ij) / sqrt(d_h) )
      m_i      = sum_j alpha_ij (v_node_j + v_edge_ij)
      gate     = sigmoid(lin_ih(m_i) + lin_hh(x_i))
      upd_i    = m_i + gate * (lin_self(x_i) - m_i)
      x        = x + out_proj(upd)
      x        = norm2(x + mlp(norm1(x)))
    """

    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,  # [B, N, H]
        edge_emb: Array,  # [B, N, N, H]  (edge_emb[i, j]: j -> i)
        valid: Array,  # [B, N] bool
        deterministic: bool = True,
    ) -> Array:
        d_model = x.shape[-1]
        head_dim = d_model // self.num_heads
        B, N, _ = x.shape

        q = _dense(d_model, self.dtype, name="lin_q_node")(x)
        k_node = _dense(d_model, self.dtype, name="lin_k_node")(x)
        v_node = _dense(d_model, self.dtype, name="lin_v_node")(x)
        k_edge = _dense(d_model, self.dtype, name="lin_k_edge")(edge_emb)
        v_edge = _dense(d_model, self.dtype, name="lin_v_edge")(edge_emb)

        hs = (self.num_heads, head_dim)
        q = q.reshape(B, N, *hs)
        k = k_node.reshape(B, 1, N, *hs) + k_edge.reshape(B, N, N, *hs)
        v = v_node.reshape(B, 1, N, *hs) + v_edge.reshape(B, N, N, *hs)

        scale = math.sqrt(head_dim)
        scores = (
            jnp.einsum("bihd,bijhd->bijh", q, k, preferred_element_type=jnp.float32)
            / scale
        )
        mask = (valid[:, :, None] & valid[:, None, :])[..., None]
        neg = jnp.finfo(jnp.float32).min
        scores = jnp.where(mask, scores, neg)
        alpha = jax.nn.softmax(scores, axis=2)
        # rows with no valid keys produce uniform NaNs in torch-geometric
        # softmax-over-empty; zero them instead (those agents are masked out
        # downstream anyway)
        alpha = jnp.where(jnp.any(mask, axis=2, keepdims=True), alpha, 0.0)
        if self.dropout > 0.0 and not deterministic:
            alpha = nn.Dropout(rate=self.dropout)(alpha, deterministic=False)
        m = jnp.einsum(
            "bijh,bijhd->bihd", alpha, v, preferred_element_type=jnp.float32
        ).reshape(B, N, d_model).astype(self.dtype)

        gate = jax.nn.sigmoid(
            _dense(d_model, self.dtype, name="lin_ih")(m)
            + _dense(d_model, self.dtype, name="lin_hh")(x)
        )
        upd = m + gate * (_dense(d_model, self.dtype, name="lin_self")(x) - m)
        out = _dense(d_model, self.dtype, name="out_proj")(upd)
        if self.dropout > 0.0 and not deterministic:
            out = nn.Dropout(rate=self.dropout)(out, deterministic=False)
        x = x + out

        h = layer_norm(self.dtype, "norm1")(x)
        h = _dense(self.dim_feedforward, self.dtype, name="mlp_lin1")(h)
        h = nn.relu(h)
        if self.dropout > 0.0 and not deterministic:
            h = nn.Dropout(rate=self.dropout)(h, deterministic=False)
        h = _dense(d_model, self.dtype, name="mlp_lin2")(h)
        if self.dropout > 0.0 and not deterministic:
            h = nn.Dropout(rate=self.dropout)(h, deterministic=False)
        return layer_norm(self.dtype, "norm2")(x + h)


class MapEncoderPtsMA(nn.Module):
    """Per-agent road-segment encoder (ctg_arch.py:262-337):
    per (agent, polyline) learned-seed attention pooling over 2-d points,
    fused with road-type features."""

    cfg: Config

    @nn.compact
    def __call__(
        self, road_points: Array, road_types: Array, deterministic: bool = True
    ) -> tuple[Array, Array]:
        """road_points [B, M, S, P, 3]; road_types [B, M, S, 8] ->
        (features [B, M, S, H], seg_valid [B, M, S])."""
        mc = self.cfg.model
        H = mc.hidden_dim
        dtype = jnp.dtype(mc.compute_dtype)
        B, M, S, P, _ = road_points.shape

        point_valid = road_points[..., -1] > 0.0  # [B, M, S, P]
        seg_valid = jnp.any(point_valid, axis=-1)  # [B, M, S]
        # NaN guards (ctg_arch.py:303-305)
        point_valid = point_valid.at[..., 0].set(
            jnp.where(seg_valid, point_valid[..., 0], True)
        )
        agent_has_road = jnp.any(seg_valid, axis=-1)
        seg_valid = seg_valid.at[..., 0].set(
            jnp.where(agent_has_road, seg_valid[..., 0], True)
        )

        pts = _dense(H, dtype, name="road_pts_lin")(
            road_points[..., :2].astype(dtype)
        ).reshape(B * M * S, P, H)
        seed = self.param(
            "map_seeds", nn.initializers.xavier_uniform(), (1, 1, H)
        ).astype(dtype)
        seed = jnp.broadcast_to(seed, (B * M * S, 1, H))
        pooled = MultiHeadAttention(8, dtype, mc.dropout, d_model=H, name="road_pts_attn_layer")(
            seed,
            pts,
            pts,
            key_padding_mask=point_valid.reshape(B * M * S, P),
            deterministic=deterministic,
        )
        pooled = layer_norm(dtype, "norm1")(pooled)
        ff = _dense(H * 3, dtype, name="map_feats_lin1")(pooled)
        ff = nn.relu(ff)
        if mc.dropout > 0.0 and not deterministic:
            ff = nn.Dropout(rate=mc.dropout)(ff, deterministic=False)
        ff = _dense(H, dtype, name="map_feats_lin2")(ff)
        pooled = layer_norm(dtype, "norm2")(pooled + ff)
        pooled = pooled.reshape(B, M, S, H)

        type_emb = _dense(H, dtype, name="road_type_lin")(road_types.astype(dtype))
        fused = jnp.concatenate([pooled, type_emb], axis=-1)
        fused = _dense(H * 3, dtype, name="road_pt_type_mlp_lin1")(fused)
        fused = nn.relu(fused)
        if mc.dropout > 0.0 and not deterministic:
            fused = nn.Dropout(rate=mc.dropout)(fused, deterministic=False)
        fused = _dense(H, dtype, name="road_pt_type_mlp_lin2")(fused)
        return fused, seg_valid


class DiTTrunk(nn.Module):
    """The interleaved temporal/social/map attention stack shared by the
    denoiser and the RTG model (ctg_arch.py:389-409 / rtg_model.py:66-82)."""

    cfg: Config
    inject_diffusion_step: bool = True

    @nn.compact
    def __call__(
        self,
        agent_emb: Array,  # [B, N, T, H]
        exist: Array,  # [B, N, T] bool
        edge_emb: Array,  # [B, T, N, N, H]
        map_features: Array,  # [B, N, S, H]
        map_valid: Array,  # [B, N, S]
        diff_step_emb: Array | None = None,  # [B, H]
        deterministic: bool = True,
    ) -> Array:
        mc = self.cfg.model
        H = mc.hidden_dim
        dtype = jnp.dtype(mc.compute_dtype)
        B, N, T, _ = agent_emb.shape
        pe = positional_encoding_table(100, H)[:T].astype(dtype)

        x = agent_emb
        for i in range(mc.num_transformer_encoder_layers):
            if self.inject_diffusion_step and diff_step_emb is not None:
                x = x + diff_step_emb[:, None, None, :].astype(dtype)

            # temporal: per-agent transformer over T (2 sub-layers,
            # ctg_arch.py:396-400); NaN guard: fully-missing agents get their
            # last step unmasked
            t_valid = exist
            none_valid = ~jnp.any(t_valid, axis=-1)
            t_valid = t_valid.at[..., -1].set(
                jnp.where(none_valid, True, t_valid[..., -1])
            )
            xt = (x + pe[None, None]).reshape(B * N, T, H)
            kpm = t_valid.reshape(B * N, T)
            for j in range(2):
                xt = TransformerEncoderLayer(
                    mc.num_heads, mc.dim_feedforward, mc.dropout, dtype,
                    name=f"temporal_{i}_{j}",
                )(xt, key_padding_mask=kpm, deterministic=deterministic)
            x = xt.reshape(B, N, T, H)

            # social: per-timestep relative attention over agents
            xs = jnp.swapaxes(x, 1, 2).reshape(B * T, N, H)
            ee = edge_emb.reshape(B * T, N, N, H)
            sv = jnp.swapaxes(exist, 1, 2).reshape(B * T, N)
            xs = RelativeSocialAttention(
                mc.num_heads, mc.dim_feedforward, mc.dropout, dtype,
                name=f"social_{i}",
            )(xs, ee, sv, deterministic=deterministic)
            x = jnp.swapaxes(xs.reshape(B, T, N, H), 1, 2)

            # map: per-agent cross-attention to its road segments
            S = map_features.shape[2]
            xm = x.reshape(B * N, T, H)
            mf = map_features.reshape(B * N, S, H)
            mv = map_valid.reshape(B * N, S)
            delta = MultiHeadAttention(
                mc.num_heads, dtype, mc.dropout, d_model=H, name=f"map_attn_{i}"
            )(xm, mf, mf, key_padding_mask=mv, deterministic=deterministic)
            x = x + delta.reshape(B, N, T, H)
        return x


class DiT(nn.Module):
    """The CTG++ denoiser (ctg_arch.py:340-511)."""

    cfg: Config

    @nn.compact
    def __call__(
        self,
        future_k: Array,  # [B, N, T_out, 7] noisy (state5 + action2)
        cond: dict,
        diffusion_step: Array,  # [B]
        deterministic: bool = True,
    ) -> Array:
        mc = self.cfg.model
        wc = self.cfg.waymo
        H = mc.hidden_dim
        dtype = jnp.dtype(mc.compute_dtype)

        past_states = cond["agent_past_states"]  # [B, N, T_in, 8]
        past_actions = cond["agent_past_actions"]  # [B, N, T_in, 2]
        B, N, T_in, _ = past_states.shape
        T_out = future_k.shape[2]
        tgt_k = wc.k_attr - 2  # 5: local state dims

        types = jnp.broadcast_to(
            cond["agent_types"][:, :, None, :], (B, N, T_in + T_out, wc.num_agent_types)
        )
        width_length = jnp.broadcast_to(
            past_states[:, :, -1:, 5:7], (B, N, T_out, 2)
        )
        future_sa = jnp.concatenate(
            [future_k[..., :tgt_k], width_length, future_k[..., tgt_k:]], axis=-1
        )  # [B, N, T_out, 9]
        past_sa = jnp.concatenate(
            [past_states[..., :-1], past_actions], axis=-1
        )  # [B, N, T_in, 9]
        past_exist = past_states[..., -1] > 0  # [B, N, T_in]
        exist = jnp.concatenate(
            [past_exist, jnp.broadcast_to(past_exist[:, :, -1:], (B, N, T_out))],
            axis=-1,
        )  # [B, N, T_in+T_out]

        seq = jnp.concatenate([past_sa, future_sa], axis=2)
        seq = jnp.concatenate([seq, types.astype(seq.dtype)], axis=-1)

        state_act_emb = MLPLayer(H, H, dtype=dtype, name="embed_state_action")(
            seq.astype(dtype)
        )
        goal_emb = MLPLayer(H, H, dtype=dtype, name="embed_goal")(
            cond["goals"].astype(dtype)
        )[:, :, None, :]
        if not deterministic and mc.goal_dropout > 0.0:
            keep = (
                jax.random.uniform(self.make_rng("dropout"), (B, N, 1, 1))
                > mc.goal_dropout
            )
            goal_emb = goal_emb * keep.astype(dtype)
        goal_emb = jnp.broadcast_to(goal_emb, state_act_emb.shape)

        # timesteps [B, T_in+T_out] — the reference fills them all with the
        # 'present' step (dataset_ctg_plus_plus.py:335) — broadcast over agents
        t_emb = Embed(wc.max_timestep, H, dtype, name="embed_timestep")(
            cond["timesteps"].astype(jnp.int32)
        )[:, None, :, :]
        t_emb = jnp.broadcast_to(t_emb, state_act_emb.shape)

        if mc.use_rtg:
            r = cond["rtgs"][:, :, -1].astype(jnp.int32)  # [B, N, 3]
            rg = Embed(wc.rtg_discretization, H, dtype, name="embed_rtg_goal")(r[..., 0])
            rv = Embed(wc.rtg_discretization, H, dtype, name="embed_rtg_veh")(r[..., 1])
            rr = Embed(wc.rtg_discretization, H, dtype, name="embed_rtg_road")(r[..., 2])
            rtg_emb = _dense(H, dtype, name="embed_rtg")(
                jnp.concatenate([rg, rv, rr], axis=-1)
            )[:, :, None, :]
            rtg_emb = jnp.broadcast_to(rtg_emb, state_act_emb.shape)
            fused = MLPLayer(H, H, dtype=dtype, name="embed_all_elements")(
                jnp.concatenate([state_act_emb, goal_emb, rtg_emb], axis=-1)
            )
        else:
            fused = MLPLayer(H, H, dtype=dtype, name="embed_all_elements")(
                jnp.concatenate([state_act_emb, goal_emb], axis=-1)
            )
        agent_emb = fused + t_emb

        diff_emb = MLPLayer(H, H, dtype=dtype, name="diffusion_step_encoder")(
            sinusoidal_pos_emb(diffusion_step.astype(jnp.float32), H).astype(dtype)
        )

        rel = jnp.concatenate(
            [cond["past_relative_encodings"], cond["future_relative_encodings"]],
            axis=3,
        )  # [B, N, N, T, 7]
        edge_emb = SingleInputEmbedding(H, dtype, name="relative_encodings_encoder")(
            rel.astype(dtype)
        )
        edge_emb = jnp.transpose(edge_emb, (0, 3, 1, 2, 4))  # [B, T, N, N, H]

        map_features, map_valid = MapEncoderPtsMA(self.cfg, name="map_encoder")(
            cond["road_points"], cond["road_types"], deterministic
        )

        out = DiTTrunk(self.cfg, name="trunk")(
            agent_emb, exist, edge_emb, map_features, map_valid, diff_emb,
            deterministic,
        )
        future_out = out[:, :, T_in:]
        return MLPLayer(
            H, tgt_k + wc.ctg_action_dim, dtype=dtype, name="output_mlp"
        )(future_out)
