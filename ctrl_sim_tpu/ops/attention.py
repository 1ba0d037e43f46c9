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

Entry point: ``cached_decode_attention`` — self-attention of Q new tokens
over the ring buffer under a [Q, N] boolean mask shared across the batch
(the multi-agent causal predicate evaluated against the slot->timestep map).

Negative result, for the record: a matching fused kernel for the
cross-attention over the static episode memory (M = 224 keys) measured 9x
SLOWER than the XLA einsum path — each grid program has only ~µs of work at
that size, so per-program overhead dominates. The einsum path wins because
the pre-projected memory K/V are loop-invariant and XLA hoists their
per-head reshape out of the rollout scan. Fused decode attention over the
2.4 MB/lane cache, where the per-program DMA is the cost, is where Pallas
pays off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


_MASK_NEG = -1e30  # exp2 of (x + _MASK_NEG) underflows to exactly 0


def _attn_body(num_heads: int, q, k, v, mask, o_ref):
    """q [Q, H] attends k/v [N, H] under boolean/int8 mask [Q, N].

    The kernel is VPU-bound (the [Q, N] softmax passes dominate, not the
    MXU dots or the DMA), so every elementwise pass over [Q, N] counts:

    - q arrives PRE-SCALED by (1/sqrt(d)) * log2(e) (see the wrappers), so
      scores feed exp2 directly — no per-head scale pass, and exp2 is the
      TPU's native transcendental (exp lowers to exp2 + a multiply pass);
    - the mask bias is computed once, reused by all heads (arithmetic form:
      Mosaic cannot relayout i1 vectors against scalar where-branches);
    - the softmax denominator divides the [Q, d] output, not the [Q, N]
      weights.

    Fully-masked rows (t = -1 query groups at episode start) come out
    uniform-over-N and finite — their outputs are discarded by the caller.
    """
    H = q.shape[-1]
    head_dim = H // num_heads
    bias = (1.0 - mask.astype(jnp.float32)) * _MASK_NEG

    outs = []
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
            + bias
        )  # [Q, N] fp32, already in log2 units
        m = jnp.max(scores, axis=-1, keepdims=True)  # [Q, 1]
        e = jnp.exp2(scores - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)  # [Q, 1]
        outs.append(
            jnp.dot(e.astype(v.dtype), vh, preferred_element_type=jnp.float32)
            / denom
        )
    # single concatenated store: eight per-head [Q, d] stores into o_ref are
    # d=32-wide strided lane writes that Mosaic serializes — concatenating
    # in registers and storing [Q, H] once measured 10% off the whole
    # kernel at the production operating point (B=256, Q=32, N=1536;
    # tools/kernel_microbench.py projfold mode, bit-identical checksum).
    # Mosaic requires the concatenated lane dim 128-aligned; narrower
    # models (H < 128) keep the per-head stores.
    if H % 128 == 0:
        o_ref[:, :] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)
    else:
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            o_ref[:, sl] = outs[h].astype(o_ref.dtype)


def _decode_kernel(num_heads, q_ref, k_ref, v_ref, mask_ref, o_ref):
    # BlockSpec with leading 1-block gives refs shaped [1, Q, H] etc.
    _attn_body(
        num_heads, q_ref[0], k_ref[0], v_ref[0], mask_ref[:], o_ref.at[0]
    )


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def cached_decode_attention(
    q: Array,  # [B, Q, H]
    k: Array,  # [B, N, H]
    v: Array,  # [B, N, H]
    mask: Array,  # [Q, N] bool (shared across batch)
    num_heads: int,
    interpret: bool = False,
) -> Array:
    """Fused masked multi-head attention over a decode cache."""
    B, Q, H = q.shape
    N = k.shape[1]
    mask_i8 = mask.astype(jnp.int8)
    # pre-scale q outside the kernel (XLA fuses this into the projection):
    # 1/sqrt(d) for attention scaling, log2(e) so the kernel softmax runs on
    # exp2 — saves two [Q, N] passes per head in the VPU-bound kernel
    head_dim = H // num_heads
    q = q * jnp.asarray(1.4426950408889634 / (head_dim ** 0.5), q.dtype)

    # Mosaic requires sublane-dim slices 8-aligned: pad Q (e.g. the packed
    # 12-slot single-group pass) with fully-masked rows, sliced off below
    q_rows = Q
    pad = (-Q) % 8
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        mask_i8 = jnp.pad(mask_i8, ((0, pad), (0, 0)))
        Q += pad

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
        interpret=interpret,
    )(q, k, v, mask_i8)
    return out[:, :q_rows] if pad else out


def _attn_body_q8(num_heads, q, k_i8, v_i8, k_scale, v_scale, mask, o_ref):
    """Quantized-cache variant: k/v are int8 [N, H] with fp32 row scales
    [1, N]. The K scale folds into the score row-scale (q . (k*s) =
    (q . k) * s), the V scale into the softmax weights — so the matmuls run
    on the raw int8 values cast to the compute dtype (exact: |x| <= 127).
    q arrives pre-scaled by (1/sqrt(d)) * log2(e), as in _attn_body."""
    H = q.shape[-1]
    head_dim = H // num_heads
    bias = (1.0 - mask.astype(jnp.float32)) * _MASK_NEG
    kf = k_i8.astype(q.dtype)
    vf = v_i8.astype(q.dtype)

    outs = []
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        scores = (
            jax.lax.dot_general(
                q[:, sl], kf[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * k_scale
            + bias
        )  # log2 units
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp2(scores - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        wv = (e * v_scale).astype(q.dtype)
        outs.append(
            jnp.dot(wv, vf[:, sl], preferred_element_type=jnp.float32) / denom
        )
    # single concatenated store when 128-aligned (see _attn_body)
    if H % 128 == 0:
        o_ref[:, :] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)
    else:
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            o_ref[:, sl] = outs[h].astype(o_ref.dtype)


def _decode_kernel_q8(num_heads, q_ref, k_ref, v_ref, ks_ref, vs_ref, mask_ref, o_ref):
    _attn_body_q8(
        num_heads, q_ref[0], k_ref[0], v_ref[0], ks_ref[0], vs_ref[0],
        mask_ref[:], o_ref.at[0],
    )


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def cached_decode_attention_q8(
    q: Array,  # [B, Q, H]
    k: Array,  # [B, N, H] int8
    v: Array,  # [B, N, H] int8
    k_scale: Array,  # [B, N] fp32 per-token scales
    v_scale: Array,  # [B, N] fp32
    mask: Array,  # [Q, N] bool (shared across batch)
    num_heads: int,
    interpret: bool = False,
) -> Array:
    """Fused masked multi-head attention over an int8-quantized cache."""
    B, Q, H = q.shape
    N = k.shape[1]
    mask_i8 = mask.astype(jnp.int8)
    head_dim = H // num_heads
    q = q * jnp.asarray(1.4426950408889634 / (head_dim ** 0.5), q.dtype)
    q_rows = Q
    pad = (-Q) % 8  # see cached_decode_attention
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        mask_i8 = jnp.pad(mask_i8, ((0, pad), (0, 0)))
        Q += pad
    ks = k_scale[:, None, :]  # [B, 1, N] — trailing block dims must tile
    vs = v_scale[:, None, :]

    kernel = functools.partial(_decode_kernel_q8, num_heads)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Q, H), q.dtype),
        interpret=interpret,
    )(q, k, v, ks, vs, mask_i8)
    return out[:, :q_rows] if pad else out


def quantize_rows(x: Array) -> tuple[Array, Array]:
    """Per-token symmetric int8 quantization over the last axis:
    returns (int8 values, fp32 scales) with x ~= values * scales[..., None]."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[..., None]), -127, 127)
    return q.astype(jnp.int8), s
