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

    With ``dtype == int8`` (model.kv_cache_dtype), k/v hold per-token
    symmetrically quantized values and k_scale/v_scale the fp32 row scales
    [B, window, K, A] — the cache read is the streaming rollout's dominant
    HBM traffic, and int8 halves it at <0.5% relative error per row.
    """

    k: tuple
    v: tuple
    slot_t: Array
    k_scale: tuple | None = None
    v_scale: tuple | None = None

    @staticmethod
    def create(num_layers: int, B: int, window: int, A: int, K: int, H: int, dtype):
        dtype = jnp.dtype(dtype)
        quantized = dtype == jnp.int8
        scales = (
            tuple(
                jnp.zeros((B, window, K, A), jnp.float32)
                for _ in range(num_layers)
            )
            if quantized
            else None
        )
        return KVCache(
            k=tuple(
                jnp.zeros((B, window, K, A, H), dtype) for _ in range(num_layers)
            ),
            v=tuple(
                jnp.zeros((B, window, K, A, H), dtype) for _ in range(num_layers)
            ),
            slot_t=jnp.full((window,), -1, jnp.int32),
            k_scale=scales,
            v_scale=(
                tuple(
                    jnp.zeros((B, window, K, A), jnp.float32)
                    for _ in range(num_layers)
                )
                if quantized
                else None
            ),
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
                flash_interpret=mc.flash_interpret,
                cross_score_dtype=jnp.dtype(mc.cross_score_dtype),
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
    def memory_kv(self, memory: Array) -> tuple:
        """Pre-project the static episode memory into each layer's
        cross-attention K/V once per episode (the memory never changes over
        the rollout, so re-projecting it per layer per sub-pass per env step
        — the default path — is pure waste)."""
        return tuple(
            (layer.cross_attn.k_proj(memory), layer.cross_attn.v_proj(memory))
            for layer in self.layers
        )

    def decode_step(
        self,
        tokens: Array,  # [B, A, H] — one timestep, one token type (post embed_ln)
        token_type: int,  # k index of these tokens in the layout
        t: Array,  # scalar int32 — episode timestep
        cache: KVCache,
        memory: Array,
        memory_valid: Array,
        window: int,
        memory_kv: tuple | None = None,
    ) -> tuple[Array, KVCache]:
        """Incremental decode of A new tokens; returns layer-stack outputs
        [B, A, H] and the updated cache."""
        return self.decode_step_groups(
            [(tokens, token_type, t)], cache, memory, memory_valid, window,
            memory_kv=memory_kv,
        )

    def decode_step_groups(
        self,
        groups,  # sequence of (tokens [B, A, H] post embed_ln, token_type int, t scalar)
        cache: KVCache,
        memory: Array,
        memory_valid: Array,
        window: int,
        memory_kv: tuple | None = None,
        mask_override: Array | None = None,  # [Q, N] precomputed (i8/bool)
    ) -> tuple[Array, KVCache]:
        """Incremental decode of one or more A-token groups in a single
        decoder pass; returns layer-stack outputs [B, len(groups)*A, H]
        (group-major, matching the input order) and the updated cache.

        Multiple groups let the streaming rollout batch sub-passes whose
        tokens are all available at once — e.g. the previous step's action
        tokens together with the current step's state tokens — halving the
        number of full KV-cache reads per env step (the rollout's dominant
        cost; the cache is read once per layer per pass either way).

        Cache-first decode: every group's K/V are written into the ring
        buffer BEFORE attending, and the queries attend over the buffer
        alone — no [cache ‖ new] concatenation (which materialized the
        multi-MB cache every layer and dominated rollout time on TPU).

        Masking uses the *true* flat token indices i = t*(A*K) + a*K + k on
        both sides, so the training-time predicate (ops/masks.py) applies
        verbatim: freshly-written groups see each other exactly as the full
        decode would (states bidirectionally within a step, later-type
        queries see earlier-type keys of their own agent, nothing sees the
        future), and same-slot entries of a type not yet overwritten this
        step — which carry K/V from t-window but are labeled t — are masked
        by the index ordering itself.

        The agent-slot count A is taken from the token shape (and must match
        the cache), not from the config: the streaming rollout may run a
        *packed* crop with fewer slots than waymo.max_num_agents (dead-slot
        DMA is the rollout's dominant cost — see rollout/streaming.py).
        """
        mc = self.cfg.model
        K = mc.num_token_types
        A = groups[0][0].shape[1]

        slot_t = cache.slot_t
        writes = []  # (slot, token_type, row0) per group
        for gi, (_, token_type, tg) in enumerate(groups):
            slot = jnp.mod(tg, window)
            # only label slots for real timesteps: a t = -1 group (the
            # "previous action" block at episode start) writes junk K/V that
            # must stay masked via slot_t == -1 until genuinely overwritten
            slot_t = slot_t.at[slot].set(
                jnp.where(tg >= 0, tg, slot_t[slot])
            )
            writes.append((slot, token_type, gi * A))

        if mask_override is not None:
            # the rollout precomputed this step's mask outside its scan
            # (ops/masks.py:stream_step_masks — the ring labels are a
            # closed form of t, so nothing here is step-dynamic)
            mask = (mask_override != 0)[None]
        else:
            # coordinate grids for the [window, K, A] flat cache layout
            a_j = jnp.tile(jnp.arange(A), window * K)  # [window*K*A]
            k_j = jnp.tile(jnp.repeat(jnp.arange(K), A), window)
            t_j = jnp.repeat(slot_t, K * A)
            jj = t_j * (A * K) + a_j * K + k_j

            # query coordinates, group-major
            a_i = jnp.tile(jnp.arange(A), len(groups))
            t_i = jnp.concatenate(
                [jnp.broadcast_to(jnp.asarray(tg, jnp.int32), (A,)) for _, _, tg in groups]
            )
            k_i = jnp.concatenate(
                [jnp.full((A,), token_type, jnp.int32) for _, token_type, _ in groups]
            )
            ii = t_i * (A * K) + a_i * K + k_i

            mask = masks.visible(
                ti=t_i[:, None],
                ai=a_i[:, None],
                ii=ii[:, None],
                tj=t_j[None, :],
                aj=a_j[None, :],
                kj=k_j[None, :],
                jj=jj[None, :],
                state_index=mc.state_token_index,
                attend_own_return_action=mc.attend_own_return_action,
                window=window,
            ) & (t_j[None, :] >= 0)
            mask = mask[None]

        x = jnp.concatenate([tokens for tokens, _, _ in groups], axis=1)
        # the fused kernel's [*, H] blocks need the lane dim 128-aligned
        # (Mosaic tiling); narrow models (hidden_dim < 128, e.g. the SMALL
        # artifact configs) take the einsum path on TPU too
        use_pallas = (
            bool(mc.use_pallas_attention)
            and jax.default_backend() == "tpu"
            and mc.hidden_dim % 128 == 0
        )
        quantized = cache.k_scale is not None
        new_k, new_v, new_ks, new_vs = [], [], [], []
        for li, layer in enumerate(self.layers):
            x, k_buf, v_buf, ks_buf, vs_buf = layer.decode_step(
                x,
                memory,
                cache.k[li],
                cache.v[li],
                writes,
                mask,
                memory_valid,
                use_pallas=use_pallas,
                mem_kv=None if memory_kv is None else memory_kv[li],
                k_scale_buf=cache.k_scale[li] if quantized else None,
                v_scale_buf=cache.v_scale[li] if quantized else None,
            )
            new_k.append(k_buf)
            new_v.append(v_buf)
            new_ks.append(ks_buf)
            new_vs.append(vs_buf)

        return x, KVCache(
            k=tuple(new_k),
            v=tuple(new_v),
            slot_t=slot_t,
            k_scale=tuple(new_ks) if quantized else None,
            v_scale=tuple(new_vs) if quantized else None,
        )
