"""Multi-agent causal decoder + heads (reference: modules/decoder.py:8-79).

4-layer transformer decoder over the interleaved token sequence with the
multi-agent causal mask (closed-form, ops/masks.py) and cross-attention to
the map/initial-state memory; heads:

- predict_action: 1000-way categorical, read from the *rtg-token* stream
  (token type 1 in the default layout, decoder.py:58)
- predict_rtg: 350 bins x 3 components, read from the *state-token* stream
- predict_future_states: 32 future (x, y) per token, from the action stream

Two execution paths:

- ``__call__``: full-sequence decode (training / exact-mode rollout)
- ``decode_step``: incremental decode of one timestep's A tokens of a single
  token type against a ring-buffer KV cache — the streaming rollout path.
  The causal-mask predicate is evaluated against the cache's slot->timestep
  mapping, so a sliding 32-step window over a 90-step episode costs
  O(A * window) attention per step instead of O((32*A*3)^2) re-decode.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.models.layers import MLPLayer, TransformerDecoderLayer
from ctrl_sim_tpu.ops import masks

Array = jax.Array


class DecoderOutput(NamedTuple):
    action_preds: Array  # [B, A, T, 1000]
    rtg_preds: Array | None  # [B, A, T, 350*3]
    state_preds: Array | None  # [B, A, T, T_ctx*2]


class KVCache(NamedTuple):
    """Ring-buffer self-attention cache for the streaming decoder.

    k, v: [num_layers, B, window, K, A, H] — token-type-major within each
    timestep slot, so appending one timestep's A tokens of one type is a
    single contiguous ``dynamic_update_slice`` (a strided scatter here costs
    ~10x on TPU and was the original rollout bottleneck).
    slot_t: [window] — the episode timestep stored in each slot (-1 empty).
    """

    k: Array
    v: Array
    slot_t: Array

    @staticmethod
    def create(num_layers: int, B: int, window: int, A: int, K: int, H: int, dtype):
        return KVCache(
            k=jnp.zeros((num_layers, B, window, K, A, H), dtype),
            v=jnp.zeros((num_layers, B, window, K, A, H), dtype),
            slot_t=jnp.full((window,), -1, jnp.int32),
        )


class Decoder(nn.Module):
    cfg: Config

    def setup(self):
        mc = self.cfg.model
        wc = self.cfg.waymo
        dtype = jnp.dtype(mc.compute_dtype)
        self._dtype = dtype
        self.layers = [
            TransformerDecoderLayer(
                mc.num_heads, mc.dim_feedforward, mc.dropout, dtype,
                name=f"decoder_layer_{i}",
            )
            for i in range(mc.num_decoder_layers)
        ]
        self.predict_action = MLPLayer(mc.hidden_dim, wc.action_dim, dtype=dtype)
        if mc.predict_rtg:
            self.predict_rtg = MLPLayer(
                mc.hidden_dim,
                wc.rtg_discretization * mc.num_reward_components,
                dtype=dtype,
            )
        if mc.predict_future_states:
            self.predict_future_states = MLPLayer(
                mc.hidden_dim, wc.train_context_length * 2, dtype=dtype
            )

    # ------------------------------------------------------------------
    def __call__(
        self,
        tokens: Array,  # [B, T*A*K, H]
        memory: Array,  # [B, M, H]
        memory_valid: Array,  # [B, M]
        num_timesteps: int,
        deterministic: bool = True,
        window: int | None = None,
    ) -> DecoderOutput:
        mc = self.cfg.model
        wc = self.cfg.waymo
        K = mc.num_token_types
        A = wc.max_num_agents
        T = num_timesteps

        mask = masks.multi_agent_causal_mask(
            T,
            A,
            K,
            state_index=mc.state_token_index,
            attend_own_return_action=mc.attend_own_return_action,
            window=window,
        )

        x = tokens
        for layer in self.layers:
            x = layer(
                x,
                memory,
                tgt_mask=mask,
                memory_key_padding_mask=memory_valid,
                deterministic=deterministic,
            )

        B = x.shape[0]
        H = x.shape[-1]
        streams = x.reshape(B, T * A, K, H)

        def head_reshape(y: Array) -> Array:
            D = y.shape[-1]
            return jnp.swapaxes(y.reshape(B, T, A, D), 1, 2)

        action_stream = 1 if K == 3 else 0
        action_preds = head_reshape(self.predict_action(streams[:, :, action_stream]))

        rtg_preds = None
        if mc.predict_rtg:
            rtg_preds = head_reshape(self.predict_rtg(streams[:, :, 0]))

        state_preds = None
        if mc.predict_future_states:
            state_preds = head_reshape(self.predict_future_states(streams[:, :, 2]))

        return DecoderOutput(
            action_preds=action_preds, rtg_preds=rtg_preds, state_preds=state_preds
        )

    # ------------------------------------------------------------------
    def decode_step(
        self,
        tokens: Array,  # [B, A, H] — one timestep, one token type (post embed_ln)
        token_type: int,  # k index of these tokens in the layout
        t: Array,  # scalar int32 — episode timestep
        cache: KVCache,
        memory: Array,
        memory_valid: Array,
        window: int,
    ) -> tuple[Array, KVCache]:
        """Incremental decode of A new tokens; returns layer-stack outputs
        [B, A, H] and the updated cache."""
        mc = self.cfg.model
        wc = self.cfg.waymo
        K = mc.num_token_types
        A = wc.max_num_agents
        B = tokens.shape[0]
        H = tokens.shape[-1]

        # cache coordinate grids for the [window, K, A] flat layout
        cache_t = cache.slot_t  # [window] episode timesteps (-1 = empty)
        a_j = jnp.tile(jnp.arange(A), window * K)  # [window*K*A]
        k_j = jnp.tile(jnp.repeat(jnp.arange(K), A), window)
        t_j = jnp.repeat(cache_t, K * A)

        # query coords: same t, all agents, fixed token type
        a_i = jnp.arange(A)
        # within-step ordering index: token (a, k) sits at a*K + k
        ii = a_i * K + token_type

        # ---- mask vs cache (past + this step's earlier types) -------------
        cache_vis = masks.visible(
            ti=t,
            ai=a_i[:, None],
            ii=jnp.asarray(10**9),  # cache positions are strictly earlier
            tj=t_j[None, :],
            aj=a_j[None, :],
            kj=k_j[None, :],
            jj=jnp.asarray(0),
            state_index=mc.state_token_index,
            attend_own_return_action=mc.attend_own_return_action,
            window=window,
        ) & (t_j[None, :] >= 0)
        # exclude the current slot's positions for this and later token
        # types: they are either the appended new tokens (handled below) or
        # still-empty zeros whose keys would add spurious softmax mass
        cache_vis = cache_vis & ~((t_j[None, :] == t) & (k_j[None, :] >= token_type))

        # ---- mask among the A new tokens (same t, same k) ------------------
        # token (t, a_i, k) attends token (t, a_j, k): per predicate,
        # visible iff k == state_index (all states visible) or a_i == a_j.
        same_type_vis = masks.visible(
            ti=t,
            ai=a_i[:, None],
            ii=ii[:, None],
            tj=t,
            aj=a_i[None, :],
            kj=jnp.full((A,), token_type)[None, :],
            jj=ii[None, :],
            state_index=mc.state_token_index,
            attend_own_return_action=mc.attend_own_return_action,
            window=window,
        )

        x = tokens
        # Thread ONE buffer through the layer loop: each layer reads the
        # partially-updated cache (the positions this sub-pass writes are
        # visibility-masked, so the values are irrelevant) — reading the
        # *old* buffer instead would force XLA to materialize a full copy
        # of the multi-hundred-MB cache per layer to preserve it.
        k_buf = cache.k
        v_buf = cache.v
        slot = jnp.mod(t, window)
        mask = jnp.concatenate([cache_vis, same_type_vis], axis=-1)[None]

        for li, layer in enumerate(self.layers):
            flat_k = k_buf[li].reshape(B, window * K * A, H)
            flat_v = v_buf[li].reshape(B, window * K * A, H)
            x, (k_new, v_new) = layer(
                x,
                memory,
                tgt_mask=mask,
                memory_key_padding_mask=memory_valid,
                deterministic=True,
                self_cache_kv=(flat_k, flat_v),
                return_self_kv=True,
            )
            # contiguous dynamic-update-slice into [li, :, slot, k, :, :]
            idx = (li, 0, slot, token_type, 0, 0)
            k_buf = jax.lax.dynamic_update_slice(
                k_buf, k_new[None, :, None, None, :, :].astype(k_buf.dtype), idx
            )
            v_buf = jax.lax.dynamic_update_slice(
                v_buf, v_new[None, :, None, None, :, :].astype(v_buf.dtype), idx
            )

        slot_t = cache.slot_t.at[slot].set(t)
        return x, KVCache(k=k_buf, v=v_buf, slot_t=slot_t)
