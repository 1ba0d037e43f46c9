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
from ctrl_sim_tpu.ops.flash_attention import MaskSpec as FlashMaskSpec

Array = jax.Array


class DecoderOutput(NamedTuple):
    action_preds: Array  # [B, A, T, 1000]
    rtg_preds: Array | None  # [B, A, T, 350*3]
    state_preds: Array | None  # [B, A, T, T_ctx*2]


class KVCache(NamedTuple):
    """Ring-buffer self-attention cache for the streaming decoder.

    k, v: per-layer tuples of [B, window, K, A, H] — token-type-major within
    each timestep slot, so appending one timestep's A tokens of one type is a
    single contiguous ``dynamic_update_slice``, and per-layer tuples keep
    each buffer's dataflow linear so XLA updates it in place inside the scan
    (a single stacked [L, ...] array forced whole-cache copies).
    slot_t: [window] — the episode timestep stored in each slot (-1 empty).
    """

    k: tuple
    v: tuple
    slot_t: Array

    @staticmethod
    def create(num_layers: int, B: int, window: int, A: int, K: int, H: int, dtype):
        return KVCache(
            k=tuple(
                jnp.zeros((B, window, K, A, H), dtype) for _ in range(num_layers)
            ),
            v=tuple(
                jnp.zeros((B, window, K, A, H), dtype) for _ in range(num_layers)
            ),
            slot_t=jnp.full((window,), -1, jnp.int32),
        )


class Decoder(nn.Module):
    cfg: Config

    def setup(self):
        mc = self.cfg.model
        wc = self.cfg.waymo
        dtype = jnp.dtype(mc.compute_dtype)
        self._dtype = dtype
        layer_cls = (
            nn.remat(TransformerDecoderLayer, static_argnums=(5, 6))
            if mc.remat
            else TransformerDecoderLayer
        )
        self.layers = [
            layer_cls(
                mc.num_heads, mc.dim_feedforward, mc.dropout, dtype,
                d_model=mc.hidden_dim, flash_block_q=mc.flash_block_q,
                flash_interpret=mc.flash_interpret, name=f"decoder_layer_{i}",
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

        use_flash = bool(mc.use_flash_attention) and (
            jax.default_backend() == "tpu" or mc.flash_interpret
        )
        if use_flash:
            # blockwise in-kernel mask: never materialize the [N, N] boolean
            mask = None
            mask_spec = FlashMaskSpec(
                num_agents=A,
                num_types=K,
                state_index=mc.state_token_index,
                attend_own_return_action=mc.attend_own_return_action,
                window=window,
            )
        else:
            mask = masks.multi_agent_causal_mask(
                T,
                A,
                K,
                state_index=mc.state_token_index,
                attend_own_return_action=mc.attend_own_return_action,
                window=window,
            )
            mask_spec = None

        x = tokens
        for layer in self.layers:
            # positional call: nn.remat static_argnums indexes positionally
            x = layer(x, memory, mask, memory_valid, deterministic, mask_spec)

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

        # Cache-first decode: this sub-pass's K/V are written into the ring
        # buffer BEFORE attending, and the query attends over the buffer
        # alone — no [cache ‖ new] concatenation (which materialized the
        # multi-MB cache every layer and dominated rollout time on TPU).
        slot = jnp.mod(t, window)
        slot_t = cache.slot_t.at[slot].set(t)  # updated first: the current
        # slot's positions now carry t_j == t for the mask below

        # coordinate grids for the [window, K, A] flat layout
        a_j = jnp.tile(jnp.arange(A), window * K)  # [window*K*A]
        k_j = jnp.tile(jnp.repeat(jnp.arange(K), A), window)
        t_j = jnp.repeat(slot_t, K * A)
        a_i = jnp.arange(A)

        is_cur = (t_j[None, :] == t) & (k_j[None, :] == token_type)
        # past/current-earlier-type positions: the standard predicate with
        # cache entries ordered strictly before the queries
        cache_rule = masks.visible(
            ti=t,
            ai=a_i[:, None],
            ii=jnp.asarray(10**9),
            tj=t_j[None, :],
            aj=a_j[None, :],
            kj=k_j[None, :],
            jj=jnp.asarray(0),
            state_index=mc.state_token_index,
            attend_own_return_action=mc.attend_own_return_action,
            window=window,
        ) & (t_j[None, :] >= 0)
        # same-slot LATER token types are stale leftovers from t - window
        cache_rule = cache_rule & ~(
            (t_j[None, :] == t) & (k_j[None, :] > token_type)
        )
        # the freshly-written positions follow the within-step rule: state
        # tokens attend all agents' states bidirectionally; rtg/action only
        # their own (train_utils.py:96-111 within-block structure)
        if token_type == mc.state_token_index:
            cur_rule = jnp.ones((A, A), bool)
        else:
            cur_rule = jnp.eye(A, dtype=bool)
        # the current positions are the contiguous block
        # [(slot*K + token_type)*A, +A): overwrite with the within-step rule
        mask = jnp.where(is_cur, False, cache_rule)
        base = (slot * K + token_type) * A
        mask = jax.lax.dynamic_update_slice(mask, cur_rule, (0, base))
        mask = mask[None]

        x = tokens
        use_pallas = bool(mc.use_pallas_attention) and jax.default_backend() == "tpu"
        new_k, new_v = [], []
        for li, layer in enumerate(self.layers):
            x, k_buf, v_buf = layer.decode_step(
                x,
                memory,
                cache.k[li],
                cache.v[li],
                slot,
                token_type,
                mask,
                memory_valid,
                use_pallas=use_pallas,
            )
            new_k.append(k_buf)
            new_v.append(v_buf)

        return x, KVCache(k=tuple(new_k), v=tuple(new_v), slot_t=slot_t)
