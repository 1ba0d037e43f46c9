"""Pallas decode/cross-attention kernels vs the einsum reference
(interpret mode)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctrl_sim_tpu.ops.attention import (
    _decode_kernel,
    _decode_kernel_q8,
    quantize_rows,
)


def _reference(q, k, v, mask, num_heads):
    """mask: [A, N] shared, or [B, N] per-lane key padding."""
    B, A, H = q.shape
    N = k.shape[1]
    d = H // num_heads
    qh = q.reshape(B, A, num_heads, d)
    kh = k.reshape(B, N, num_heads, d)
    vh = v.reshape(B, N, num_heads, d)
    scores = jnp.einsum("bahd,bnhd->bhan", qh, kh) / np.sqrt(d)
    neg = jnp.finfo(jnp.float32).min
    if mask.ndim == 2 and mask.shape == (A, N):
        scores = jnp.where(mask[None, None], scores, neg)
    else:  # [B, N] key padding
        scores = jnp.where(mask[:, None, None, :], scores, neg)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhan,bnhd->bahd", w, vh)
    return out.reshape(B, A, H)


def test_decode_kernel_matches_reference_interpret():
    rng = np.random.default_rng(0)
    B, A, N, H, heads = 2, 8, 48, 64, 2
    q = jnp.asarray(rng.normal(size=(B, A, H)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    mask = jnp.asarray(rng.random((A, N)) > 0.3)
    # guarantee every row has at least one visible key
    mask = mask.at[:, 0].set(True)

    kernel = functools.partial(_decode_kernel, heads)
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
        interpret=True,
    )(q, k, v, mask.astype(jnp.int8))

    want = _reference(q, k, v, mask, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_decode_kernel_q8_matches_dequantized_reference():
    """int8 cache kernel == einsum attention over the dequantized K/V
    (the quantization error itself cancels: both sides see the same
    int8*scale values; only softmax/accum order differs)."""
    rng = np.random.default_rng(3)
    B, A, N, H, heads = 2, 8, 48, 64, 2
    q = jnp.asarray(rng.normal(size=(B, A, H)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    mask = jnp.asarray(rng.random((A, N)) > 0.3).at[:, 0].set(True)

    k_i8, ks = quantize_rows(k)
    v_i8, vs = quantize_rows(v)

    kernel = functools.partial(_decode_kernel_q8, heads)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, A, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, A, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, A, H), q.dtype),
        interpret=True,
    )(q, k_i8, v_i8, ks[:, None, :], vs[:, None, :], mask.astype(jnp.int8))

    k_dq = k_i8.astype(jnp.float32) * ks[..., None]
    v_dq = v_i8.astype(jnp.float32) * vs[..., None]
    want = _reference(q, k_dq, v_dq, mask, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-4)
    # and the quantized result stays close to the unquantized attention
    want_fp = _reference(q, k, v, mask, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_fp), atol=0.05)


def test_decode_kernel_bf16_inputs_interpret():
    """Rollout dtype: bf16 q/k/v with fp32 softmax and accumulation."""
    rng = np.random.default_rng(2)
    B, A, N, H, heads = 2, 8, 48, 64, 2
    q32 = rng.normal(size=(B, A, H)).astype(np.float32)
    k32 = rng.normal(size=(B, N, H)).astype(np.float32)
    v32 = rng.normal(size=(B, N, H)).astype(np.float32)
    mask = jnp.asarray(rng.random((A, N)) > 0.3).at[:, 0].set(True)

    kernel = functools.partial(_decode_kernel, heads)
    run = lambda q, k, v: pl.pallas_call(
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
        interpret=True,
    )(q, k, v, mask.astype(jnp.int8))

    out = run(
        jnp.asarray(q32, jnp.bfloat16),
        jnp.asarray(k32, jnp.bfloat16),
        jnp.asarray(v32, jnp.bfloat16),
    )
    want = _reference(
        jnp.asarray(q32), jnp.asarray(k32), jnp.asarray(v32), mask, heads
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want), atol=5e-2, rtol=5e-2
    )
