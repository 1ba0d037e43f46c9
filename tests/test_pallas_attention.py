"""Pallas decode-attention kernels vs the einsum reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from ctrl_sim_tpu.ops.attention import (
    cached_decode_attention,
    cached_decode_attention_q8,
    quantize_rows,
)


def _reference(q, k, v, mask, num_heads):
    """mask: [Q, N] shared across the batch."""
    B, Q, H = q.shape
    N = k.shape[1]
    d = H // num_heads
    qh = q.reshape(B, Q, num_heads, d)
    kh = k.reshape(B, N, num_heads, d)
    vh = v.reshape(B, N, num_heads, d)
    scores = jnp.einsum("bahd,bnhd->bhan", qh, kh) / np.sqrt(d)
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask[None, None], scores, neg)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhan,bnhd->bahd", w, vh)
    return out.reshape(B, Q, H)


def test_decode_kernel_matches_reference_interpret():
    rng = np.random.default_rng(0)
    B, Q, N, H, heads = 2, 8, 48, 64, 2
    q = jnp.asarray(rng.normal(size=(B, Q, H)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    mask = jnp.asarray(rng.random((Q, N)) > 0.3)
    # guarantee every row has at least one visible key
    mask = mask.at[:, 0].set(True)

    out = cached_decode_attention(q, k, v, mask, heads, interpret=True)
    want = _reference(q, k, v, mask, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_decode_kernel_fully_masked_rows_finite():
    """Rows with no visible key (the t = -1 action group at episode start)
    must come out finite (uniform attention), never NaN — their K/V writes
    feed later layers even though the outputs are discarded."""
    rng = np.random.default_rng(4)
    B, Q, N, H, heads = 1, 8, 48, 64, 2
    q = jnp.asarray(rng.normal(size=(B, Q, H)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    mask = jnp.zeros((Q, N), bool).at[4:].set(True)  # rows 0-3 fully masked

    out = np.asarray(cached_decode_attention(q, k, v, mask, heads, interpret=True))
    assert np.isfinite(out).all()


def test_decode_kernel_q8_matches_dequantized_reference():
    """int8 cache kernel == einsum attention over the dequantized K/V
    (the quantization error itself cancels: both sides see the same
    int8*scale values; only softmax/accum order differs)."""
    rng = np.random.default_rng(3)
    B, Q, N, H, heads = 2, 8, 48, 64, 2
    q = jnp.asarray(rng.normal(size=(B, Q, H)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    mask = jnp.asarray(rng.random((Q, N)) > 0.3).at[:, 0].set(True)

    k_i8, ks = quantize_rows(k)
    v_i8, vs = quantize_rows(v)
    out = cached_decode_attention_q8(
        q, k_i8, v_i8, ks, vs, mask, heads, interpret=True
    )

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
    B, Q, N, H, heads = 2, 8, 48, 64, 2
    q32 = rng.normal(size=(B, Q, H)).astype(np.float32)
    k32 = rng.normal(size=(B, N, H)).astype(np.float32)
    v32 = rng.normal(size=(B, N, H)).astype(np.float32)
    mask = jnp.asarray(rng.random((Q, N)) > 0.3).at[:, 0].set(True)

    out = cached_decode_attention(
        jnp.asarray(q32, jnp.bfloat16),
        jnp.asarray(k32, jnp.bfloat16),
        jnp.asarray(v32, jnp.bfloat16),
        mask,
        heads,
        interpret=True,
    )
    want = _reference(
        jnp.asarray(q32), jnp.asarray(k32), jnp.asarray(v32), mask, heads
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want), atol=5e-2, rtol=5e-2
    )


def test_decode_kernel_q_pad_path_interpret():
    """Q not a multiple of 8 exercises the Mosaic sublane-alignment pad
    branch (the packed 12-slot single-group pass hits it in production):
    rows are padded fully-masked and sliced off — unpadded rows must equal
    the einsum reference for both the bf16 and q8 kernels (ADVICE r4)."""
    rng = np.random.default_rng(3)
    B, Q, N, H, heads = 2, 12, 48, 64, 2
    q = jnp.asarray(rng.normal(size=(B, Q, H)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    mask = jnp.asarray(rng.random((Q, N)) > 0.3)
    mask = mask.at[:, 0].set(True)

    out = cached_decode_attention(q, k, v, mask, heads, interpret=True)
    assert out.shape == (B, Q, H)
    want = _reference(q, k, v, mask, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)

    k_i8, ks = quantize_rows(k)
    v_i8, vs = quantize_rows(v)
    out8 = cached_decode_attention_q8(
        q, k_i8, v_i8, ks, vs, mask, heads, interpret=True
    )
    assert out8.shape == (B, Q, H)
    kd = k_i8.astype(jnp.float32) * ks[..., None]
    vd = v_i8.astype(jnp.float32) * vs[..., None]
    want8 = _reference(q, kd, vd, mask, heads)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(want8), atol=3e-3)


def test_decode_kernel_concat_store_path_interpret():
    """H a multiple of 128 takes the single concatenated [Q, H] store (the
    production 256-d path; round 5) instead of per-head strided stores —
    every earlier case here used H=64, which keeps the per-head branch, so
    the shipped store structure was untested. Both kernels, vs the einsum
    reference."""
    rng = np.random.default_rng(5)
    B, Q, N, H, heads = 2, 8, 48, 128, 4
    q = jnp.asarray(rng.normal(size=(B, Q, H)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    mask = jnp.asarray(rng.random((Q, N)) > 0.3).at[:, 0].set(True)

    out = cached_decode_attention(q, k, v, mask, heads, interpret=True)
    want = _reference(q, k, v, mask, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)

    k_i8, ks = quantize_rows(k)
    v_i8, vs = quantize_rows(v)
    out8 = cached_decode_attention_q8(
        q, k_i8, v_i8, ks, vs, mask, heads, interpret=True
    )
    kd = k_i8.astype(jnp.float32) * ks[..., None]
    vd = v_i8.astype(jnp.float32) * vs[..., None]
    want8 = _reference(q, kd, vd, mask, heads)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(want8), atol=3e-3)
