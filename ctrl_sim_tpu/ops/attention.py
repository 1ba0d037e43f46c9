"""Pallas fused decode attention for the streaming rollout.

Why these kernels exist: in the incremental decode, XLA's einsum path
reshapes the K/V cache [B, N, 256] into per-head [B, N, 8, 32] — and with
head_dim=32 below the 128-lane tile, that reshape is a full HBM re-layout of
the multi-MB cache per layer per sub-pass (measured: ~22 x 38 MB copies per
env step, the dominant rollout cost). These kernels read the cache once in
its native [N, H] layout, split heads with *static VMEM slices*, and fuse
mask + softmax + weighted sum — HBM traffic drops to the unavoidable single
read of K and V.

The kernel is VPU-bound, not DMA-bound (349 us/call vs a 184 us DMA ideal at
the round-2 softmax), so the [Q, N] elementwise passes per head are the
cost. The softmax is therefore restructured to the minimum pass count:

- q arrives PRE-SCALED by (1/sqrt(d)) * log2(e), so scores are in log2
  units and feed ``exp2`` (the TPU's native transcendental) directly;
- NO max-subtraction pass: scores are clamped at +100 (log2) and shifted by
  an additive bias that is -inf on masked pairs — exp2 then yields exact
  zeros for masked keys and can never overflow f32 (2^100 * N < f32 max).
  Real logits live far below the clamp (LayerNorm-bounded QK), so the
  clamp never binds outside pathological inputs; rows whose true max
  underflows (all keys masked) are handled below;
- the softmax weights are written once, in **bfloat16** — halving the bytes
  of every subsequent pass over [Q, N] (~0.4% relative rounding on the
  weights, fp32 accumulation everywhere);
- the denominator is reduced from the bf16 weights in fp32 and divides the
  [Q, d] output, never the [Q, N] weights;
- fully-masked rows (the t = -1 query groups at episode start) produce
  denom = 0 -> output exactly 0 via the max(denom, tiny) guard. Their
  outputs are discarded by the caller, but they MUST stay finite: later
  layers project cache K/V from these rows, and a NaN there would poison
  every subsequent softmax denominator.

Per-head VPU traffic over [Q, N] drops from ~5 f32 passes (bias add, max,
exp, sum, cast) to 1 f32 write + 1.5 mixed passes.

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


# log2-unit clamp on scores: exp2(100) ~ 1.3e30, times N=2304 stays finite
# in the f32 denominator; real LayerNorm-bounded logits never reach it.
_SCORE_CLAMP = 100.0
_DENOM_FLOOR = 1e-30


def _attn_body(num_heads: int, q, k, v, bias, o_ref):
    """q [Q, H] attends k/v [N, H] under additive bias [Q, N] (bf16,
    -inf = masked, 0 = attend). q is pre-scaled by (1/sqrt(d)) * log2(e)."""
    H = q.shape[-1]
    head_dim = H // num_heads

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q[:, sl]  # [Q, d] — static VMEM slice, no relayout
        kh = k[:, sl]  # [N, d]
        vh = v[:, sl]
        scores = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Q, N] fp32, log2 units
        e = jnp.exp2(
            jnp.minimum(scores, _SCORE_CLAMP) + bias.astype(jnp.float32)
        ).astype(v.dtype)  # bf16 weights: halves every later [Q, N] pass
        denom = jnp.sum(
            e.astype(jnp.float32), axis=-1, keepdims=True
        )  # [Q, 1]
        out_h = jnp.dot(
            e, vh, preferred_element_type=jnp.float32
        ) / jnp.maximum(denom, _DENOM_FLOOR)
        o_ref[:, sl] = out_h.astype(o_ref.dtype)


def _decode_kernel(num_heads, q_ref, k_ref, v_ref, bias_ref, o_ref):
    # BlockSpec with leading 1-block gives refs shaped [1, Q, H] etc.
    _attn_body(
        num_heads, q_ref[0], k_ref[0], v_ref[0], bias_ref[:], o_ref.at[0]
    )


def _mask_bias(mask: Array) -> Array:
    """[Q, N] boolean -> additive bf16 bias: 0 where True, -inf where False
    (computed once in XLA, fused; shared by every head and layer call)."""
    return jnp.where(
        mask, jnp.bfloat16(0), -jnp.inf * jnp.ones((), jnp.bfloat16)
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
    bias = _mask_bias(mask)
    # pre-scale q outside the kernel (XLA fuses this into the projection):
    # 1/sqrt(d) for attention scaling, log2(e) so the kernel softmax runs on
    # exp2 — saves two [Q, N] passes per head in the VPU-bound kernel
    head_dim = H // num_heads
    q = q * jnp.asarray(1.4426950408889634 / (head_dim ** 0.5), q.dtype)

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
    )(q, k, v, bias)
    return out


def _attn_body_q8(num_heads, q, k_i8, v_i8, k_scale, v_scale, bias, o_ref):
    """Quantized-cache variant: k/v are int8 [N, H] with fp32 row scales
    [1, N]. The K scale folds into the score row-scale (q . (k*s) =
    (q . k) * s) inside the exp2 input pass, the V scale into the bf16
    weight write — the matmuls run on raw int8 values cast to the compute
    dtype (exact: |x| <= 127). Same no-max softmax as _attn_body."""
    H = q.shape[-1]
    head_dim = H // num_heads
    kf = k_i8.astype(q.dtype)
    vf = v_i8.astype(q.dtype)

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        scores = jax.lax.dot_general(
            q[:, sl], kf[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Q, N] raw int-space scores (log2 units after k_scale)
        e = jnp.exp2(
            jnp.minimum(scores * k_scale, _SCORE_CLAMP)
            + bias.astype(jnp.float32)
        )
        wv = (e * v_scale).astype(q.dtype)  # bf16 weights, V scale folded in
        denom = jnp.sum(e, axis=-1, keepdims=True)
        out_h = jnp.dot(
            wv, vf[:, sl], preferred_element_type=jnp.float32
        ) / jnp.maximum(denom, _DENOM_FLOOR)
        o_ref[:, sl] = out_h.astype(o_ref.dtype)


def _decode_kernel_q8(num_heads, q_ref, k_ref, v_ref, ks_ref, vs_ref, bias_ref, o_ref):
    _attn_body_q8(
        num_heads, q_ref[0], k_ref[0], v_ref[0], ks_ref[0], vs_ref[0],
        bias_ref[:], o_ref.at[0],
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
    bias = _mask_bias(mask)
    head_dim = H // num_heads
    q = q * jnp.asarray(1.4426950408889634 / (head_dim ** 0.5), q.dtype)
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
    )(q, k, v, ks, vs, bias)
    return out


def quantize_rows(x: Array) -> tuple[Array, Array]:
    """Per-token symmetric int8 quantization over the last axis:
    returns (int8 values, fp32 scales) with x ~= values * scales[..., None]."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[..., None]), -127, 127)
    return q.astype(jnp.int8), s
