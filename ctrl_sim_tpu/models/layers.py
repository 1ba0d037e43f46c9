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
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.relu(x)
        return _dense(self.output_dim, self.dtype)(x)


class MultiHeadAttention(nn.Module):
    """Batched multi-head attention with additive-boolean masking and an
    optional KV cache interface for incremental decoding.

    ``mask``: broadcastable boolean [batch?, heads?, Tq, Tk], True = attend.
    ``key_padding_mask``: [B, Tk] boolean, True = valid key.
    """

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        query: Array,  # [B, Tq, D]
        key: Array,  # [B, Tk, D]
        value: Array,  # [B, Tk, D]
        mask: Array | None = None,
        key_padding_mask: Array | None = None,
        deterministic: bool = True,
        cache_kv: tuple[Array, Array] | None = None,
        return_kv: bool = False,
    ):
        d_model = query.shape[-1]
        head_dim = d_model // self.num_heads

        q = _dense(d_model, self.dtype, name="q_proj")(query)
        k = _dense(d_model, self.dtype, name="k_proj")(key)
        v = _dense(d_model, self.dtype, name="v_proj")(value)
        new_kv = (k, v)
        if cache_kv is not None:
            # incremental decode: prepend previously projected keys/values
            k = jnp.concatenate([cache_kv[0], k], axis=1)
            v = jnp.concatenate([cache_kv[1], v], axis=1)

        B, Tq, _ = q.shape
        Tk = k.shape[1]
        q = q.reshape(B, Tq, self.num_heads, head_dim)
        k = k.reshape(B, Tk, self.num_heads, head_dim)
        v = v.reshape(B, Tk, self.num_heads, head_dim)

        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(head_dim).astype(jnp.float32)

        neg = jnp.finfo(jnp.float32).min
        if mask is not None:
            m = mask
            while m.ndim < 4:
                m = m[None]
            scores = jnp.where(m, scores, neg)
        if key_padding_mask is not None:
            scores = jnp.where(key_padding_mask[:, None, None, :], scores, neg)

        weights = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        if self.dropout > 0.0 and not deterministic:
            weights = nn.Dropout(rate=self.dropout)(weights, deterministic=False)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", weights, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        out = out.reshape(B, Tq, d_model)
        out = _dense(d_model, self.dtype, name="out_proj")(out)
        if return_kv:
            return out, new_kv
        return out


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
            self.num_heads, self.dtype, self.dropout, name="self_attn"
        )(src, src, src, key_padding_mask=key_padding_mask, deterministic=deterministic)
        if self.dropout > 0.0 and not deterministic:
            attn = nn.Dropout(rate=self.dropout)(attn, deterministic=False)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(src + attn)

        ff = _dense(self.dim_feedforward, self.dtype, name="linear1")(src)
        ff = nn.relu(ff)
        if self.dropout > 0.0 and not deterministic:
            ff = nn.Dropout(rate=self.dropout)(ff, deterministic=False)
        ff = _dense(src.shape[-1], self.dtype, name="linear2")(ff)
        if self.dropout > 0.0 and not deterministic:
            ff = nn.Dropout(rate=self.dropout)(ff, deterministic=False)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(src + ff)


class TransformerDecoderLayer(nn.Module):
    """torch nn.TransformerDecoderLayer defaults: self-attn -> cross-attn ->
    FF, each with residual + post-LN."""

    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: Array,
        memory: Array,
        tgt_mask: Array | None = None,
        memory_key_padding_mask: Array | None = None,
        deterministic: bool = True,
        self_cache_kv: tuple[Array, Array] | None = None,
        return_self_kv: bool = False,
    ):
        sa_out = MultiHeadAttention(
            self.num_heads, self.dtype, self.dropout, name="self_attn"
        )(
            tgt,
            tgt,
            tgt,
            mask=tgt_mask,
            deterministic=deterministic,
            cache_kv=self_cache_kv,
            return_kv=return_self_kv,
        )
        if return_self_kv:
            sa, new_kv = sa_out
        else:
            sa = sa_out
        if self.dropout > 0.0 and not deterministic:
            sa = nn.Dropout(rate=self.dropout)(sa, deterministic=False)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt + sa)

        ca = MultiHeadAttention(
            self.num_heads, self.dtype, self.dropout, name="cross_attn"
        )(
            tgt,
            memory,
            memory,
            key_padding_mask=memory_key_padding_mask,
            deterministic=deterministic,
        )
        if self.dropout > 0.0 and not deterministic:
            ca = nn.Dropout(rate=self.dropout)(ca, deterministic=False)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt + ca)

        ff = _dense(self.dim_feedforward, self.dtype, name="linear1")(tgt)
        ff = nn.relu(ff)
        if self.dropout > 0.0 and not deterministic:
            ff = nn.Dropout(rate=self.dropout)(ff, deterministic=False)
        ff = _dense(tgt.shape[-1], self.dtype, name="linear2")(ff)
        if self.dropout > 0.0 and not deterministic:
            ff = nn.Dropout(rate=self.dropout)(ff, deterministic=False)
        out = nn.LayerNorm(dtype=self.dtype, name="norm3")(tgt + ff)
        if return_self_kv:
            return out, new_kv
        return out


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
