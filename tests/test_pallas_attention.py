"""Pallas decode-attention kernel vs the einsum reference (interpret mode)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctrl_sim_tpu.ops.attention import _squeeze_kernel


def _reference(q, k, v, mask, num_heads):
    B, A, H = q.shape
    N = k.shape[1]
    d = H // num_heads
    qh = q.reshape(B, A, num_heads, d)
    kh = k.reshape(B, N, num_heads, d)
    vh = v.reshape(B, N, num_heads, d)
    scores = jnp.einsum("bahd,bnhd->bhan", qh, kh) / np.sqrt(d)
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask[None, None], scores, neg)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhan,bnhd->bahd", w, vh)
    return out.reshape(B, A, H)


def test_kernel_matches_reference_interpret():
    rng = np.random.default_rng(0)
    B, A, N, H, heads = 2, 8, 48, 64, 2
    q = jnp.asarray(rng.normal(size=(B, A, H)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    mask = jnp.asarray(rng.random((A, N)) > 0.3)
    # guarantee every row has at least one visible key
    mask = mask.at[:, 0].set(True)

    kernel = functools.partial(_squeeze_kernel, heads)
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
