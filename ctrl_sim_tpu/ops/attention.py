"""Pallas fused decode attention for the streaming rollout.

Why this kernel exists: in the incremental decode, XLA's einsum path
reshapes the K/V cache [B, N, 256] into per-head [B, N, 8, 32] — and with
head_dim=32 below the 128-lane tile, that reshape is a full HBM re-layout of
the multi-MB cache per layer per sub-pass (measured: ~22 x 38 MB copies per
env step, the dominant rollout cost). This kernel reads the cache once in
its native [N, H] layout, splits heads with *static VMEM slices*, and fuses
mask + softmax + weighted sum — HBM traffic drops to the unavoidable single
read of K and V.

Per-lane working set at full size (N = 32*3*24 = 2304, H = 256, bf16):
q 12 KB + K/V 2.4 MB + scores 0.9 MB — comfortably inside VMEM, so the grid
is simply (B,) with no inner blocking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _decode_attn_kernel(num_heads: int, q_ref, k_ref, v_ref, mask_ref, o_ref):
    """One batch lane: q [A, H] attends K/V [N, H] under mask [A, N]."""
    q = q_ref[:].astype(jnp.float32)  # [A, H]
    k = k_ref[:].astype(jnp.float32)  # [N, H]
    v = v_ref[:].astype(jnp.float32)
    mask = mask_ref[:]  # [A, N] int8/bool
    H = q.shape[-1]
    head_dim = H // num_heads
    scale = 1.0 / (head_dim ** 0.5)
    neg = jnp.finfo(jnp.float32).min

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q[:, sl]  # [A, d] — static VMEM slice, no relayout
        kh = k[:, sl]  # [N, d]
        vh = v[:, sl]
        scores = (
            jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # [A, N]
        scores = jnp.where(mask != 0, scores, neg)
        weights = jax.nn.softmax(scores, axis=-1)
        out_h = jnp.dot(weights, vh, preferred_element_type=jnp.float32)  # [A, d]
        o_ref[:, sl] = out_h.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def cached_decode_attention(
    q: Array,  # [B, A, H]
    k: Array,  # [B, N, H]
    v: Array,  # [B, N, H]
    mask: Array,  # [A, N] bool (shared across batch)
    num_heads: int,
) -> Array:
    """Fused masked multi-head attention over a decode cache."""
    B, A, H = q.shape
    N = k.shape[1]
    mask_i8 = mask.astype(jnp.int8)

    kernel = functools.partial(_squeeze_kernel, num_heads)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, A, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, A, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, A, H), q.dtype),
    )(q, k, v, mask_i8)
    return out


def _squeeze_kernel(num_heads, q_ref, k_ref, v_ref, mask_ref, o_ref):
    # BlockSpec with leading 1-block gives refs shaped [1, A, H] etc.
    _decode_attn_kernel(
        num_heads,
        q_ref.at[0],
        k_ref.at[0],
        v_ref.at[0],
        mask_ref,
        o_ref.at[0],
    )
