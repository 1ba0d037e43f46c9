"""Tokenizer + scene encoder (reference: modules/encoder.py:9-178).

Embeds per-(timestep, agent) state+goal / return-to-go / action tokens with
timestep and agent-id embeddings, stacks them into the
(state, rtg, action) interleaved sequence — DT reorders to
(rtg, state, action); IL drops RTGs; trajeglish keeps only actions — and
encodes map polylines + initial-state tokens into the cross-attention memory
with a 2-layer transformer encoder.

Written setup()-style with separable methods so the streaming rollout can
embed one timestep's tokens at a time and encode the memory once per episode
(the incremental KV-cache decode path), while training uses the fused
``__call__``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.models.layers import (
    Embed,
    MLPLayer,
    TransformerEncoderLayer,
    _dense,
    layer_norm,
)
from ctrl_sim_tpu.models.map_encoder import MapEncoder

Array = jax.Array


class SceneEncoding(NamedTuple):
    stacked_embeddings: Array  # [B, T*A*K, H] decoder target sequence
    encoder_embeddings: Array  # [B, P(+A), H] cross-attention memory
    memory_valid: Array  # [B, P(+A)] bool


class Encoder(nn.Module):
    cfg: Config

    def setup(self):
        mc = self.cfg.model
        wc = self.cfg.waymo
        H = mc.hidden_dim
        dtype = jnp.dtype(mc.compute_dtype)
        self._dtype = dtype
        if mc.use_map:
            self.map_encoder = MapEncoder(self.cfg)
        self.embed_state = MLPLayer(H, H, dtype=dtype)
        self.embed_goal = MLPLayer(H, H, dtype=dtype)
        self.embed_state_goal = _dense(H, dtype)
        self.embed_action = Embed(wc.action_dim, H, dtype)
        if mc.decision_transformer:
            self.embed_rtg_goal = _dense(H, dtype)
            self.embed_rtg_veh = _dense(H, dtype)
            self.embed_rtg_road = _dense(H, dtype)
        else:
            self.embed_rtg_goal = Embed(wc.rtg_discretization, H, dtype)
            self.embed_rtg_veh = Embed(wc.rtg_discretization, H, dtype)
            self.embed_rtg_road = Embed(wc.rtg_discretization, H, dtype)
        self.embed_rtg = _dense(H, dtype)
        self.embed_timestep = Embed(wc.max_timestep, H, dtype)
        self.embed_agent_id = Embed(wc.max_num_agents, H, dtype)
        self.embed_ln = layer_norm(dtype)
        self.encoder_layers = [
            TransformerEncoderLayer(
                mc.num_heads, mc.dim_feedforward, mc.dropout, dtype,
                name=f"encoder_layer_{i}",
            )
            for i in range(mc.num_transformer_encoder_layers)
        ]

    # ------------------------------------------------------------------
    # token embedders — each takes [..., ] leading dims ending with a token
    # axis; existence [..., 1] multiplies the result (encoder.py:128-133)
    # ------------------------------------------------------------------
    def embed_state_tokens(
        self,
        states12: Array,  # [..., 12]
        goals: Array,  # [..., goal_dim]
        t_ids: Array,  # [...] int
        agent_ids: Array,  # [...] int
        existence: Array,  # [..., 1]
        goal_keep: Array | None = None,  # [..., 1] train-time goal dropout
    ) -> Array:
        t_emb = self.embed_timestep(t_ids)
        id_emb = self.embed_agent_id(agent_ids)
        s = self.embed_state(states12.astype(self._dtype))
        g = self.embed_goal(goals.astype(self._dtype))
        if goal_keep is not None:
            g = g * goal_keep.astype(self._dtype)
        out = self.embed_state_goal(jnp.concatenate([s, g], axis=-1)) + t_emb + id_emb
        return out * existence.astype(self._dtype)

    def embed_rtg_tokens(
        self, rtgs: Array, t_ids: Array, agent_ids: Array, existence: Array
    ) -> Array:
        if self.cfg.model.decision_transformer:
            rg = self.embed_rtg_goal(rtgs[..., 0:1].astype(self._dtype))
            rv = self.embed_rtg_veh(rtgs[..., 1:2].astype(self._dtype))
            rr = self.embed_rtg_road(rtgs[..., 2:3].astype(self._dtype))
        else:
            r = rtgs.astype(jnp.int32)
            rg = self.embed_rtg_goal(r[..., 0])
            rv = self.embed_rtg_veh(r[..., 1])
            rr = self.embed_rtg_road(r[..., 2])
        out = (
            self.embed_rtg(jnp.concatenate([rg, rv, rr], axis=-1))
            + self.embed_timestep(t_ids)
            + self.embed_agent_id(agent_ids)
        )
        return out * existence.astype(self._dtype)

    def embed_action_tokens(
        self, actions: Array, t_ids: Array, agent_ids: Array, existence: Array
    ) -> Array:
        out = (
            self.embed_action(actions.astype(jnp.int32))
            + self.embed_timestep(t_ids)
            + self.embed_agent_id(agent_ids)
        )
        if self.cfg.model.no_actions:
            return out * jnp.zeros_like(existence.astype(self._dtype))
        return out * existence.astype(self._dtype)

    # ------------------------------------------------------------------
    def encode_memory(
        self,
        road_points: Array,
        road_types: Array,
        initial_state_emb: Array,  # [B, A, H]
        initial_exist: Array,  # [B, A] bool
        deterministic: bool = True,
    ) -> tuple[Array, Array]:
        mc = self.cfg.model
        if mc.use_map:
            poly_tokens, poly_valid = self.map_encoder(
                road_points, road_types, deterministic
            )
            if mc.encode_initial_state:
                memory = jnp.concatenate([poly_tokens, initial_state_emb], axis=1)
                memory_valid = jnp.concatenate([poly_valid, initial_exist], axis=1)
            else:
                memory = poly_tokens
                memory_valid = poly_valid
        else:
            memory = initial_state_emb
            memory_valid = initial_exist
        for layer in self.encoder_layers:
            memory = layer(
                memory, key_padding_mask=memory_valid, deterministic=deterministic
            )
        return memory, memory_valid

    # ------------------------------------------------------------------
    def __call__(self, batch: dict, deterministic: bool = True) -> SceneEncoding:
        mc = self.cfg.model
        wc = self.cfg.waymo
        H = mc.hidden_dim

        agent_states = batch["agent_states"]  # [B, A, T, 8]
        B, A, T, _ = agent_states.shape
        existence = agent_states[..., -1:]  # [B, A, T, 1]

        def tflat(x):  # [B, A, T, ...] -> [B, T*A, ...]
            x = jnp.swapaxes(x, 1, 2)
            return x.reshape((B, T * A) + x.shape[3:])

        states7 = agent_states[..., :-1]
        types = jnp.broadcast_to(
            batch["agent_types"][:, :, None, :], (B, A, T, wc.num_agent_types)
        )
        states12 = jnp.concatenate([states7, types], axis=-1)
        goals = jnp.broadcast_to(
            batch["goals"][:, :, None, : wc.goal_dim], (B, A, T, wc.goal_dim)
        )
        timesteps = jnp.broadcast_to(batch["timesteps"][:, None, :], (B, A, T))
        agent_ids = jnp.broadcast_to(jnp.arange(A)[None, :, None], (B, A, T))

        states12 = tflat(states12)
        goals = tflat(goals)
        actions = tflat(batch["actions"])
        rtgs = tflat(batch["rtgs"])
        t_ids = tflat(timesteps).astype(jnp.int32)
        a_ids = tflat(agent_ids).astype(jnp.int32)
        ex = tflat(existence)

        goal_keep = None
        if not deterministic and mc.goal_dropout > 0.0:
            keep = (
                jax.random.uniform(self.make_rng("dropout"), (B, A))
                > mc.goal_dropout
            )
            goal_keep = jnp.broadcast_to(keep[:, None, :], (B, T, A)).reshape(
                B, T * A, 1
            )

        state_emb = self.embed_state_tokens(states12, goals, t_ids, a_ids, ex, goal_keep)
        rtg_emb = self.embed_rtg_tokens(rtgs, t_ids, a_ids, ex)
        action_emb = self.embed_action_tokens(actions, t_ids, a_ids, ex)

        def interleave(parts: list[Array]) -> Array:
            stacked = jnp.stack(parts, axis=2)  # [B, T*A, K, H]
            return stacked.reshape(B, T * A * len(parts), H)

        if mc.decision_transformer:
            tokens = interleave([rtg_emb, state_emb, action_emb])
        elif mc.trajeglish:
            tokens = action_emb
        elif mc.il:
            tokens = interleave([state_emb, action_emb])
        else:
            tokens = interleave([state_emb, rtg_emb, action_emb])
        tokens = self.embed_ln(tokens)

        initial_state_emb = (state_emb.reshape(B, T, A, H))[:, 0]
        initial_exist = (ex.reshape(B, T, A))[:, 0] > 0

        memory, memory_valid = self.encode_memory(
            batch["road_points"],
            batch["road_types"],
            initial_state_emb,
            initial_exist,
            deterministic,
        )
        return SceneEncoding(
            stacked_embeddings=tokens,
            encoder_embeddings=memory,
            memory_valid=memory_valid,
        )
