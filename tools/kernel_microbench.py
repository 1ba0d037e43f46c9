"""Microbenchmark the fused decode-attention kernel on TPU with ablated
bodies, to locate its cost (DMA vs MXU dots vs softmax VPU passes).

Usage (TPU env): PYTHONPATH=/root/.axon_site:. python tools/kernel_microbench.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, Q, N, H, HEADS = 64, 48, 2304, 256, 8
D = H // HEADS
REPS = 200


def body_full(q, k, v, mask, o_ref):
    bias = (1.0 - mask.astype(jnp.float32)) * -1e30
    for h in range(HEADS):
        sl = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias
        m = jnp.max(s, -1, keepdims=True)
        e = jnp.exp2(s - m)
        den = jnp.sum(e, -1, keepdims=True)
        o_ref[:, sl] = (
            jnp.dot(e.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32)
            / den
        ).astype(o_ref.dtype)


def body_no_softmax(q, k, v, mask, o_ref):
    bias = (1.0 - mask.astype(jnp.float32)) * -1e30
    for h in range(HEADS):
        sl = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias
        o_ref[:, sl] = jnp.dot(
            s.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def body_dma_only(q, k, v, mask, o_ref):
    # touch K and V minimally: one reduction each, no [Q,N] intermediates
    acc = jnp.sum(k.astype(jnp.float32), axis=0) + jnp.sum(
        v.astype(jnp.float32), axis=0
    )  # [H]
    o_ref[:, :] = jnp.broadcast_to(acc[None, :], o_ref.shape).astype(o_ref.dtype)


def run(body, name):
    def kern(q_ref, k_ref, v_ref, mask_ref, o_ref):
        body(q_ref[0], k_ref[0], v_ref[0], mask_ref[:], o_ref.at[0])

    f = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Q, H), jnp.bfloat16),
    )

    @jax.jit
    def many(q, k, v, mask):
        def step(c, _):
            o = f(q + c.astype(jnp.bfloat16) * 0, k, v, mask)
            return c + 1, o[0, 0, 0]

        c, ys = jax.lax.scan(step, jnp.asarray(0, jnp.int32), None, length=REPS)
        return ys

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Q, H)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, N, H)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, N, H)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((Q, N)) > 0.3, jnp.int8)

    out = many(q, k, v, mask)
    float(np.asarray(out).sum())  # force
    t0 = time.time()
    out = many(q, k, v, mask)
    s = float(np.asarray(out).sum())
    dt = time.time() - t0
    per_call = dt / REPS * 1e6
    gbps = (2 * N * H * 2 * B) / (dt / REPS) / 1e9
    print(f"{name:16s} {per_call:8.1f} us/call   K+V read {gbps:7.1f} GB/s   (checksum {s:.1f})")


if __name__ == "__main__":
    print(f"B={B} Q={Q} N={N} H={H} heads={HEADS}, {REPS} reps under one jit")
    run(body_dma_only, "dma_only")
    run(body_no_softmax, "no_softmax")
    run(body_full, "full")



def run_split(nsplit, name):
    """dma_only with the K/V read split over a 2D grid (B, nsplit) —
    does more outstanding block copies raise effective bandwidth?"""
    def kern(q_ref, k_ref, v_ref, o_ref):
        acc = jnp.sum(k_ref[0].astype(jnp.float32), axis=0) + jnp.sum(
            v_ref[0].astype(jnp.float32), axis=0
        )
        o_ref[0, :, :] = jnp.broadcast_to(acc[None, :], o_ref.shape[1:]).astype(
            o_ref.dtype
        )

    Nc = N // nsplit
    f = pl.pallas_call(
        kern,
        grid=(B, nsplit),
        in_specs=[
            pl.BlockSpec((1, Q, H), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nc, H), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nc, H), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q, H), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Q, H), jnp.bfloat16),
    )

    @jax.jit
    def many(q, k, v):
        def step(c, _):
            o = f(q + c.astype(jnp.bfloat16) * 0, k, v)
            return c + 1, o[0, 0, 0]
        c, ys = jax.lax.scan(step, jnp.asarray(0, jnp.int32), None, length=REPS)
        return ys

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Q, H)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, N, H)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, N, H)), jnp.bfloat16)
    out = many(q, k, v)
    float(np.asarray(out).sum())
    t0 = time.time()
    out = many(q, k, v)
    s_ = float(np.asarray(out).sum())
    dt = time.time() - t0
    per_call = dt / REPS * 1e6
    gbps = (2 * N * H * 2 * B) / (dt / REPS) / 1e9
    print(f"{name:16s} {per_call:8.1f} us/call   K+V read {gbps:7.1f} GB/s")


if __name__ == "__main__":
    run_split(2, "dma_split2")
    run_split(4, "dma_split4")
    run_split(8, "dma_split8")
