"""Pallas fused decode attention for the streaming rollout.

Why these kernels exist: in the incremental decode, XLA's einsum path
reshapes the K/V cache [B, N, 256] into per-head [B, N, 8, 32] — and with
head_dim=32 below the 128-lane tile, that reshape is a full HBM re-layout of
the multi-MB cache per layer per sub-pass (measured: ~22 x 38 MB copies per
env step, the dominant rollout cost). These kernels read the cache once in
its native [N, H] layout, split heads with *static VMEM slices*, and fuse
mask + softmax + weighted sum — HBM traffic drops to the unavoidable single
read of K and V.

Matmuls run in the input dtype (bf16 in rollout) with fp32 accumulation
(`preferred_element_type`): upcasting K/V to fp32 before the dot both halves
MXU throughput and doubles VMEM pressure. Softmax stays fp32.

Per-lane working set at full size (N = 32*3*24 = 2304, H = 256, bf16):
q 12-24 KB + K/V 2.4 MB + scores 0.9 MB — comfortably inside VMEM, so the
grid is simply (B,) with no inner blocking.

Two entry points:

- ``cached_decode_attention``: self-attention of Q new tokens over the ring
  buffer under a [Q, N] boolean mask shared across the batch (the
  multi-agent causal predicate evaluated against the slot->timestep map).
- ``cached_cross_attention``: cross-attention over the static episode
  memory (map polylines + initial states) with pre-projected K/V and a
  per-lane [B, M] key-padding mask. Pre-projecting K/V once per episode
  removes 2 projections x layers x sub-passes per env step AND the per-call
  head-split relayout of the memory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _attn_body(num_heads: int, q, k, v, mask, o_ref):
    """q [Q, H] attends k/v [N, H] under boolean/int8 mask [Q, N]."""
    H = q.shape[-1]
    head_dim = H // num_heads
    scale = 1.0 / (head_dim ** 0.5)
    neg = jnp.finfo(jnp.float32).min

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q[:, sl]  # [Q, d] — static VMEM slice, no relayout
        kh = k[:, sl]  # [N, d]
        vh = v[:, sl]
        scores = (
            jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # [Q, N] fp32
        scores = jnp.where(mask != 0, scores, neg)
        weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out_h = jnp.dot(weights, vh, preferred_element_type=jnp.float32)
        o_ref[:, sl] = out_h.astype(o_ref.dtype)


def _decode_kernel(num_heads, q_ref, k_ref, v_ref, mask_ref, o_ref):
    # BlockSpec with leading 1-block gives refs shaped [1, Q, H] etc.
    _attn_body(
        num_heads, q_ref[0], k_ref[0], v_ref[0], mask_ref[:], o_ref.at[0]
    )


@functools.partial(jax.jit, static_argnames=("num_heads",))
def cached_decode_attention(
    q: Array,  # [B, Q, H]
    k: Array,  # [B, N, H]
    v: Array,  # [B, N, H]
    mask: Array,  # [Q, N] bool (shared across batch)
    num_heads: int,
) -> Array:
    """Fused masked multi-head attention over a decode cache."""
    B, Q, H = q.shape
    N = k.shape[1]
    mask_i8 = mask.astype(jnp.int8)

    kernel = functools.partial(_decode_kernel, num_heads)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Q, H), q.dtype),
    )(q, k, v, mask_i8)
    return out


def _cross_kernel(num_heads, q_ref, k_ref, v_ref, kpm_ref, o_ref):
    q = q_ref[0]  # [Q, H]
    Q = q.shape[0]
    kpm = kpm_ref[0]  # [1, M] int8 (kpm block is [1, 1, M])
    mask = jnp.broadcast_to(kpm, (Q, kpm.shape[-1]))
    _attn_body(num_heads, q, k_ref[0], v_ref[0], mask, o_ref.at[0])


@functools.partial(jax.jit, static_argnames=("num_heads",))
def cached_cross_attention(
    q: Array,  # [B, Q, H]
    k: Array,  # [B, M, H] pre-projected memory keys
    v: Array,  # [B, M, H]
    key_padding_mask: Array,  # [B, M] bool, True = valid
    num_heads: int,
) -> Array:
    """Fused cross-attention over a static (pre-projected) memory."""
    B, Q, H = q.shape
    M = k.shape[1]
    # [B, 1, M]: the TPU lowering requires the trailing two block dims to be
    # (8k, 128k) or match the array dims; a [1, M] block over [B, M] fails
    kpm_i8 = key_padding_mask.astype(jnp.int8)[:, None, :]

    kernel = functools.partial(_cross_kernel, num_heads)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Q, H), q.dtype),
    )(q, k, v, kpm_i8)
    return out
