"""Transformer building blocks in flax.linen.

These replicate the exact computation of the torch modules the reference
uses — ``nn.TransformerEncoderLayer`` / ``nn.TransformerDecoderLayer`` with
their defaults (post-LayerNorm, ReLU feedforward, dropout 0.1) and
``MLPLayer`` (utils/layers.py:6-19: Linear-LayerNorm-ReLU-Linear) — so that
training curves are comparable, while running matmuls in bfloat16 on the MXU
with fp32 accumulation (``preferred_element_type``).

Initializers mirror weight_init (utils/train_utils.py:14-79): Xavier-uniform
linear kernels with zero bias, N(0, 0.02) embeddings.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

XAVIER = nn.initializers.xavier_uniform()
EMBED_INIT = nn.initializers.normal(stddev=0.02)
# torch nn.LayerNorm default eps (the reference's modules all use it);
# flax's default 1e-6 drifts ~1e-3 on transplant-parity logits
LN_EPS = 1e-5


def layer_norm(dtype, name: str | None = None) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, name=name)


def _dense(features: int, dtype, name: str | None = None) -> nn.Dense:
    return nn.Dense(
        features,
        kernel_init=XAVIER,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


class MLPLayer(nn.Module):
    """Linear -> LayerNorm -> ReLU -> Linear (utils/layers.py:6-19)."""

    hidden_dim: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = _dense(self.hidden_dim, self.dtype)(x)
        x = layer_norm(self.dtype)(x)
        x = nn.relu(x)
        return _dense(self.output_dim, self.dtype)(x)


class MultiHeadAttention(nn.Module):
    """Batched multi-head attention with additive-boolean masking.

    ``mask``: broadcastable boolean [batch?, heads?, Tq, Tk], True = attend.
    ``key_padding_mask``: [B, Tk] boolean, True = valid key.

    setup()-style so the incremental decoder can call ``project_kv`` and
    ``attend`` separately: the streaming path writes freshly projected K/V
    into a ring-buffer cache FIRST and attends over the cache directly —
    concatenating [cache, new] per layer materializes the multi-MB cache
    every call and was the dominant rollout cost on TPU.
    """

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0
    d_model: int | None = None  # required (setup-style submodules)
    flash_block_q: int = 128
    flash_interpret: bool = False
    # dtype of the materialized [B, H, Tq, Tk] score matrix in the einsum
    # path. float32 = exact (default). bfloat16 halves the score-matrix HBM
    # traffic (the rollout cross-attention was ~13% of device step time at
    # 256 lanes, bounded by these f32 round trips); accumulation stays f32
    # inside the MXU, softmax max/sum stay f32 — only the stored scores and
    # the exp outputs are rounded (~0.5% relative on the weights).
    score_dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.d_model is None:
            raise ValueError("MultiHeadAttention requires d_model")
        self.q_proj = _dense(self.d_model, self.dtype)
        self.k_proj = _dense(self.d_model, self.dtype)
        self.v_proj = _dense(self.d_model, self.dtype)
        self.out_proj = _dense(self.d_model, self.dtype)
        self.attn_dropout = nn.Dropout(rate=self.dropout)

    def __call__(
        self,
        query: Array,  # [B, Tq, D]
        key: Array,  # [B, Tk, D]
        value: Array,  # [B, Tk, D]
        mask: Array | None = None,
        key_padding_mask: Array | None = None,
        deterministic: bool = True,
        mask_spec=None,  # ops.flash_attention.MaskSpec -> flash path
    ):
        q = self.q_proj(query)
        k = self.k_proj(key)
        v = self.v_proj(value)
        if mask_spec is not None:
            from ctrl_sim_tpu.ops.flash_attention import flash_mha

            dropout_p = self.dropout if not deterministic else 0.0
            seed = None
            if dropout_p > 0.0:
                seed = jax.random.bits(
                    self.make_rng("dropout"), (1,), jnp.uint32
                )
            out = flash_mha(
                q, k, v, mask_spec, self.num_heads,
                dropout_p=dropout_p, seed=seed,
                block_q=self.flash_block_q, interpret=self.flash_interpret,
            ).astype(self.dtype)
        else:
            out = self._attend_impl(q, k, v, mask, key_padding_mask, deterministic)
        return self.out_proj(out)

    def project_kv(self, key: Array, value: Array) -> tuple[Array, Array]:
        """K/V projections only (for cache fills)."""
        return self.k_proj(key), self.v_proj(value)

    def project_qkv(self, x: Array) -> tuple[Array, Array, Array]:
        """Q, K, V of the SAME input in one [D, 3D] matmul.

        The decode step projects the new tokens three times from the same
        activation; three separate [B*Q, D] x [D, D] dots are three XLA
        fusions with three HBM round trips of x. Concatenating the kernels
        (loop-invariant, hoisted out of the rollout scan by XLA) makes one
        MXU call at 3x the N dimension — measurably fewer, larger fusions in
        the streaming rollout's step body. Bit-identical per output block
        (each column block is the same dot product as the separate call).
        """
        w = jnp.concatenate(
            [
                self.q_proj.variables["params"]["kernel"],
                self.k_proj.variables["params"]["kernel"],
                self.v_proj.variables["params"]["kernel"],
            ],
            axis=1,
        ).astype(self.dtype)
        b = jnp.concatenate(
            [
                self.q_proj.variables["params"]["bias"],
                self.k_proj.variables["params"]["bias"],
                self.v_proj.variables["params"]["bias"],
            ]
        ).astype(self.dtype)
        y = x @ w + b
        D = self.d_model
        return y[..., :D], y[..., D : 2 * D], y[..., 2 * D :]

    def attend(
        self,
        query: Array,  # [B, Tq, D]
        k: Array,  # [B, Tk, D] pre-projected keys (e.g. the cache)
        v: Array,  # [B, Tk, D]
        mask: Array | None = None,
        key_padding_mask: Array | None = None,
        deterministic: bool = True,
    ) -> Array:
        q = self.q_proj(query)
        out = self._attend_impl(q, k, v, mask, key_padding_mask, deterministic)
        return self.out_proj(out)

    def _attend_impl(
        self, q, k, v, mask, key_padding_mask, deterministic
    ) -> Array:
        d_model = q.shape[-1]
        head_dim = d_model // self.num_heads
        B, Tq, _ = q.shape
        Tk = k.shape[1]
        # scale folded into q: one [B, Tq, D] multiply instead of a full
        # [B, H, Tq, Tk] pass over the scores
        q = q * jnp.asarray(1.0 / jnp.sqrt(head_dim), q.dtype)
        q = q.reshape(B, Tq, self.num_heads, head_dim)
        k = k.reshape(B, Tk, self.num_heads, head_dim)
        v = v.reshape(B, Tk, self.num_heads, head_dim)

        sd = jnp.dtype(self.score_dtype)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=sd
        )

        neg = jnp.finfo(sd).min
        if mask is not None:
            m = mask
            while m.ndim < 4:
                m = m[None]
            scores = jnp.where(m, scores, neg)
        if key_padding_mask is not None:
            scores = jnp.where(key_padding_mask[:, None, None, :], scores, neg)

        if sd == jnp.float32:
            weights = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        else:
            # low-precision scores: keep the reductions in f32 but round the
            # stored exp outputs, so every [B, H, Tq, Tk] round trip moves
            # half the bytes
            mx = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp((scores - mx).astype(jnp.float32)).astype(sd)
            den = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
            weights = (e / den.astype(sd)).astype(self.dtype)
        if self.dropout > 0.0 and not deterministic:
            weights = self.attn_dropout(weights, deterministic=False)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", weights, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        return out.reshape(B, Tq, d_model)


class TransformerEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer with defaults: post-LN, ReLU FF."""

    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: Array,
        key_padding_mask: Array | None = None,
        deterministic: bool = True,
    ) -> Array:
        attn = MultiHeadAttention(
            self.num_heads, self.dtype, self.dropout, d_model=src.shape[-1],
            name="self_attn",
        )(src, src, src, key_padding_mask=key_padding_mask, deterministic=deterministic)
        if self.dropout > 0.0 and not deterministic:
            attn = nn.Dropout(rate=self.dropout)(attn, deterministic=False)
        src = layer_norm(self.dtype, "norm1")(src + attn)

        ff = _dense(self.dim_feedforward, self.dtype, name="linear1")(src)
        ff = nn.relu(ff)
        if self.dropout > 0.0 and not deterministic:
            ff = nn.Dropout(rate=self.dropout)(ff, deterministic=False)
        ff = _dense(src.shape[-1], self.dtype, name="linear2")(ff)
        if self.dropout > 0.0 and not deterministic:
            ff = nn.Dropout(rate=self.dropout)(ff, deterministic=False)
        return layer_norm(self.dtype, "norm2")(src + ff)


class TransformerDecoderLayer(nn.Module):
    """torch nn.TransformerDecoderLayer defaults: self-attn -> cross-attn ->
    FF, each with residual + post-LN. setup()-style so the streaming decoder
    can run ``decode_step`` (cache-first incremental self-attention)."""

    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    d_model: int | None = None
    flash_block_q: int = 128
    flash_interpret: bool = False
    cross_score_dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.d_model is None:
            raise ValueError("TransformerDecoderLayer requires d_model")
        self.self_attn = MultiHeadAttention(
            self.num_heads, self.dtype, self.dropout, d_model=self.d_model,
            flash_block_q=self.flash_block_q,
            flash_interpret=self.flash_interpret,
        )
        self.cross_attn = MultiHeadAttention(
            self.num_heads, self.dtype, self.dropout, d_model=self.d_model,
            score_dtype=self.cross_score_dtype,
        )
        self.linear1 = _dense(self.dim_feedforward, self.dtype)
        self.linear2 = _dense(self.d_model, self.dtype)
        self.norm1 = layer_norm(self.dtype)
        self.norm2 = layer_norm(self.dtype)
        self.norm3 = layer_norm(self.dtype)
        self.drop = nn.Dropout(rate=self.dropout)

    def _after_self_attn(
        self,
        tgt: Array,
        sa: Array,
        memory: Array,
        memory_key_padding_mask: Array | None,
        deterministic: bool,
        mem_kv: tuple[Array, Array] | None = None,
    ) -> Array:
        if self.dropout > 0.0 and not deterministic:
            sa = self.drop(sa, deterministic=False)
        tgt = self.norm1(tgt + sa)

        if mem_kv is not None:
            # memory K/V pre-projected once per episode (the memory is
            # static over the rollout): saves 2 projections per layer per
            # sub-pass, and the per-head reshape of the loop-invariant
            # K/V is hoisted out of the rollout scan by XLA. (A fused
            # Pallas cross-attention kernel was measured SLOWER here:
            # M=224 keys gives each grid program ~µs of work, so the
            # per-program overhead dominates — see ops/attention.py.)
            mk, mv = mem_kv
            ca = self.cross_attn.attend(
                tgt, mk, mv, key_padding_mask=memory_key_padding_mask
            )
        else:
            ca = self.cross_attn(
                tgt, memory, memory,
                key_padding_mask=memory_key_padding_mask,
                deterministic=deterministic,
            )
        if self.dropout > 0.0 and not deterministic:
            ca = self.drop(ca, deterministic=False)
        tgt = self.norm2(tgt + ca)

        ff = self.linear1(tgt)
        ff = nn.relu(ff)
        if self.dropout > 0.0 and not deterministic:
            ff = self.drop(ff, deterministic=False)
        ff = self.linear2(ff)
        if self.dropout > 0.0 and not deterministic:
            ff = self.drop(ff, deterministic=False)
        return self.norm3(tgt + ff)

    def __call__(
        self,
        tgt: Array,
        memory: Array,
        tgt_mask: Array | None = None,
        memory_key_padding_mask: Array | None = None,
        deterministic: bool = True,
        tgt_mask_spec=None,  # MaskSpec: flash self-attention, no dense mask
    ) -> Array:
        sa = self.self_attn(
            tgt, tgt, tgt, mask=tgt_mask, deterministic=deterministic,
            mask_spec=tgt_mask_spec,
        )
        return self._after_self_attn(
            tgt, sa, memory, memory_key_padding_mask, deterministic
        )

    def decode_step(
        self,
        tgt: Array,  # [B, Q, H] new tokens (Q = len(writes) * A)
        memory: Array,
        k_buf: Array,  # [B, W, K, A, H] this layer's ring buffer
        v_buf: Array,
        writes,  # sequence of (slot traced int, token_type int, row0 int)
        mask: Array,  # [Tq=Q, W*K*A] boolean (True = attend), leading dims ok
        memory_key_padding_mask: Array | None,
        use_pallas: bool = False,
        mem_kv: tuple[Array, Array] | None = None,
        k_scale_buf: Array | None = None,  # [B, W, K, A] fp32 (int8 cache)
        v_scale_buf: Array | None = None,
    ):
        """Cache-first incremental decode: write the new tokens' K/V into the
        ring buffer with contiguous dynamic-update-slices (one per A-token
        group in ``writes``), then attend over the buffer directly — no
        concatenation, no cache copies.

        ``use_pallas`` routes the self-attention through the fused decode
        kernel (ops/attention.py), which avoids the per-head reshape that
        otherwise re-lays-out the whole cache in HBM every layer. An int8
        ``k_buf``/``v_buf`` (with scale buffers) halves that cache traffic;
        new K/V rows are quantized per token on write.

        Returns (out, k_buf, v_buf, k_scale_buf, v_scale_buf).
        """
        quantized = jnp.dtype(k_buf.dtype) == jnp.int8
        q_new, k_new, v_new = self.self_attn.project_qkv(tgt)
        B, W, K, A, H = k_buf.shape
        if quantized:
            from ctrl_sim_tpu.ops.attention import quantize_rows

            k_new, k_s = quantize_rows(k_new)
            v_new, v_s = quantize_rows(v_new)
        for slot, token_type, row0 in writes:
            idx = (0, slot, token_type, 0, 0)
            k_buf = jax.lax.dynamic_update_slice(
                k_buf,
                k_new[:, row0 : row0 + A][:, None, None].astype(k_buf.dtype),
                idx,
            )
            v_buf = jax.lax.dynamic_update_slice(
                v_buf,
                v_new[:, row0 : row0 + A][:, None, None].astype(v_buf.dtype),
                idx,
            )
            if quantized:
                sidx = (0, slot, token_type, 0)
                k_scale_buf = jax.lax.dynamic_update_slice(
                    k_scale_buf, k_s[:, None, None, row0 : row0 + A], sidx
                )
                v_scale_buf = jax.lax.dynamic_update_slice(
                    v_scale_buf, v_s[:, None, None, row0 : row0 + A], sidx
                )
        flat_k = k_buf.reshape(B, W * K * A, H)
        flat_v = v_buf.reshape(B, W * K * A, H)
        if use_pallas:
            q = q_new
            mask2d = mask.reshape(mask.shape[-2], mask.shape[-1])
            if quantized:
                from ctrl_sim_tpu.ops.attention import cached_decode_attention_q8

                sa = cached_decode_attention_q8(
                    q, flat_k, flat_v,
                    k_scale_buf.reshape(B, W * K * A),
                    v_scale_buf.reshape(B, W * K * A),
                    mask2d, self.num_heads,
                )
            else:
                from ctrl_sim_tpu.ops.attention import cached_decode_attention

                sa = cached_decode_attention(
                    q, flat_k, flat_v, mask2d, self.num_heads
                )
            sa = self.self_attn.out_proj(sa)
        else:
            if quantized:
                # reference dequantized path (CPU tests / non-TPU backends)
                flat_k = flat_k.astype(self.dtype) * k_scale_buf.reshape(
                    B, W * K * A, 1
                ).astype(self.dtype)
                flat_v = flat_v.astype(self.dtype) * v_scale_buf.reshape(
                    B, W * K * A, 1
                ).astype(self.dtype)
            sa = self.self_attn.out_proj(
                self.self_attn._attend_impl(
                    q_new, flat_k, flat_v, mask, None, True
                )
            )
        out = self._after_self_attn(
            tgt, sa, memory, memory_key_padding_mask, True, mem_kv=mem_kv
        )
        return out, k_buf, v_buf, k_scale_buf, v_scale_buf


class Embed(nn.Module):
    """nn.Embedding with N(0, 0.02) init (weight_init, train_utils.py:26-27)."""

    num_embeddings: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: Array) -> Array:
        table = self.param(
            "embedding", EMBED_INIT, (self.num_embeddings, self.features)
        )
        return jnp.take(table, ids, axis=0).astype(self.dtype)
