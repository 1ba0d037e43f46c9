"""Microbenchmark the fused decode-attention kernel on TPU with ablated
bodies, to locate its cost (DMA vs MXU dots vs softmax VPU passes) and to
race candidate optimizations.

The kernel is VPU-bound: per head the body runs ~5 elementwise/reduce passes
over the [Q, N] score matrix (bias add, max, sub+exp2, sum, cast-to-bf16),
while the dots are tiny for the MXU and the K/V DMA is ~184 us/call ideal at
B=64. Candidates measured here:

- nomax      : drop the running-max pass. Scores arrive in log2 units
               (q pre-scaled by log2(e)/sqrt(d)); a static offset -C in the
               mask bias keeps exp2 in range for |score| bounds far beyond
               anything LayerNorm'd activations produce (see ops/attention.py
               for the bound argument).
- denomdot   : fold the softmax denominator into the MXU by appending a ones
               column to V — the [Q, N] sum reduce becomes a free extra MXU
               output column (d 32 -> 33 of a 128-wide systolic pass).
- fp32av     : skip the e -> bf16 cast pass; run the AV dot in fp32.
- allheads   : single batched dot_general over all heads (dispatch overhead).

Usage (TPU env): PYTHONPATH=/root/.axon_site:. python tools/kernel_microbench.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# shape overrides (MB_*) so packed-crop operating points can be raced
# without editing the file: round-4 packed default is Q=24, N=1152 (A=12)
B = int(os.environ.get("MB_B", "64"))
Q = int(os.environ.get("MB_Q", "48"))
N = int(os.environ.get("MB_N", "2304"))
H, HEADS = 256, 8
D = H // HEADS
REPS = int(os.environ.get("MB_REPS", "200"))
_C = 32.0  # static exp2 offset for the no-max variants


def body_full(q, k, v, mask, o_ref):
    """Round-1 shipped body: bias add, max, sub+exp2, sum, cast, 2 dots."""
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


def body_nomax(q, k, v, mask, o_ref):
    # evaluated as ((m*1e30) - 1e30) - C: mask=1 -> -C, mask=0 -> -1e30.
    # (1e30 + C) would round to 1e30 in fp32, collapsing the offset.
    bias = (mask.astype(jnp.float32) * 1e30 - 1e30) - _C
    for h in range(HEADS):
        sl = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        e = jnp.exp2(s + bias)
        den = jnp.sum(e, -1, keepdims=True)
        o_ref[:, sl] = (
            jnp.dot(e.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32)
            / den
        ).astype(o_ref.dtype)


def body_nomax_denomdot(q, k, v, mask, o_ref):
    bias = (mask.astype(jnp.float32) * 1e30 - 1e30) - _C
    ones = jnp.ones((N, 1), v.dtype)
    for h in range(HEADS):
        sl = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        e = jnp.exp2(s + bias).astype(v.dtype)
        va = jnp.concatenate([v[:, sl], ones], axis=1)  # [N, D+1]
        r = jnp.dot(e, va, preferred_element_type=jnp.float32)
        o_ref[:, sl] = (r[:, :D] / r[:, D:]).astype(o_ref.dtype)


def body_nomax_fp32av(q, k, v, mask, o_ref):
    bias = (mask.astype(jnp.float32) * 1e30 - 1e30) - _C
    for h in range(HEADS):
        sl = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        e = jnp.exp2(s + bias)
        den = jnp.sum(e, -1, keepdims=True)
        o_ref[:, sl] = (
            jnp.dot(
                e, v[:, sl].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            / den
        ).astype(o_ref.dtype)


def body_shipped_r3(q, k, v, mask, o_ref):
    """The round-3 shipped body (ops/attention.py): no max, clamp + additive
    -inf bias, bf16 softmax weights, f32 denominator from the bf16 weights."""
    # arithmetic bias: Mosaic cannot relayout i1 vectors in a where
    bias = mask.astype(jnp.float32) * 1e30 - 1e30
    for h in range(HEADS):
        sl = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        e = jnp.exp2(jnp.minimum(s, 100.0) + bias).astype(v.dtype)
        den = jnp.sum(e.astype(jnp.float32), -1, keepdims=True)
        o_ref[:, sl] = (
            jnp.dot(e, v[:, sl], preferred_element_type=jnp.float32)
            / jnp.maximum(den, 1e-30)
        ).astype(o_ref.dtype)


def body_shipped_concat(q, k, v, mask, o_ref):
    """shipped_r3 body with head outputs concatenated and stored once
    (isolates the store-structure difference from the projfold variants)."""
    bias = mask.astype(jnp.float32) * 1e30 - 1e30
    outs = []
    for h in range(HEADS):
        sl = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        e = jnp.exp2(jnp.minimum(s, 100.0) + bias).astype(v.dtype)
        den = jnp.sum(e.astype(jnp.float32), -1, keepdims=True)
        outs.append(
            jnp.dot(e, v[:, sl], preferred_element_type=jnp.float32)
            / jnp.maximum(den, 1e-30)
        )
    o_ref[:, :] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def body_maxfree_denomdot(q, k, v, mask, o_ref):
    """No max + bf16 weights + denominator folded into the AV dot as a ones
    column (no separate [Q, N] reduce pass at all)."""
    bias = mask.astype(jnp.float32) * 1e30 - 1e30
    ones = jnp.ones((N, 8), v.dtype)  # 8-wide: sublane-aligned denom columns
    for h in range(HEADS):
        sl = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        e = jnp.exp2(jnp.minimum(s, 100.0) + bias).astype(v.dtype)
        va = jnp.concatenate([v[:, sl], ones], axis=1)  # [N, D+8]
        r = jnp.dot(e, va, preferred_element_type=jnp.float32)
        o_ref[:, sl] = (
            r[:, :D] / jnp.maximum(r[:, D : D + 1], 1e-30)
        ).astype(o_ref.dtype)


def body_allheads(q, k, v, mask, o_ref):
    """One batched QK dot + one batched AV dot over [HEADS, ., .]."""
    bias = (mask.astype(jnp.float32) * 1e30 - 1e30) - _C
    qh = q.reshape(Q, HEADS, D)  # head axis stays in place: batch dim in the dot
    kh = k.reshape(N, HEADS, D)
    vh = v.reshape(N, HEADS, D)
    s = jax.lax.dot_general(
        qh, kh, (((2,), (2,)), ((1,), (1,))), preferred_element_type=jnp.float32
    )  # [h, Q, N]
    e = jnp.exp2(s + bias[None])
    den = jnp.sum(e, -1, keepdims=True)
    o = jax.lax.dot_general(
        e.astype(v.dtype), vh, (((2,), (0,)), ((0,), (1,))),
        preferred_element_type=jnp.float32,
    ) / den  # [h, Q, D]
    o_ref[:, :] = o.transpose(1, 0, 2).reshape(Q, H).astype(o_ref.dtype)


def body_stackheads(q, k, v, mask, o_ref):
    """Round 4: 8 MXU dots as before, but ONE set of softmax passes over the
    stacked [8*Q, N] score matrix — tests whether the VPU per-op overhead of
    8 small [Q, N] pass-sets dominates at packed shapes (Q=24)."""
    bias = (1.0 - mask.astype(jnp.float32)) * -1e30
    scores = jnp.concatenate(
        [
            jax.lax.dot_general(
                q[:, h * D : (h + 1) * D], k[:, h * D : (h + 1) * D],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for h in range(HEADS)
        ],
        axis=0,
    ) + jnp.tile(bias, (HEADS, 1))  # [8Q, N]
    m = jnp.max(scores, -1, keepdims=True)
    e = jnp.exp2(scores - m)
    den = jnp.sum(e, -1, keepdims=True)
    w = (e / den).astype(v.dtype)
    for h in range(HEADS):
        sl = slice(h * D, (h + 1) * D)
        o_ref[:, sl] = jnp.dot(
            w[h * Q : (h + 1) * Q], v[:, sl],
            preferred_element_type=jnp.float32,
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


def body_q8(q, k_i8, v_i8, ks, vs, mask, o_ref):
    """int8 cache read: per-token scales fold into scores / weights
    (ops/attention.py _attn_body_q8). k_i8/v_i8 are int8 [N, H];
    ks/vs fp32 [1, N]."""
    bias = (1.0 - mask.astype(jnp.float32)) * -1e30
    kf = k_i8.astype(jnp.bfloat16)
    vf = v_i8.astype(jnp.bfloat16)
    for h in range(HEADS):
        sl = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(
            q[:, sl], kf[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * ks + bias
        m = jnp.max(s, -1, keepdims=True)
        e = jnp.exp2(s - m)
        den = jnp.sum(e, -1, keepdims=True)
        wv = (e * vs).astype(jnp.bfloat16)
        o_ref[:, sl] = (
            jnp.dot(wv, vf[:, sl], preferred_element_type=jnp.float32) / den
        ).astype(o_ref.dtype)


def body_fp8(q, k8, v8, mask, o_ref):
    """fp8(e4m3) cache read: direct cast, no scales. Halves the DMA like
    int8 but drops the two [Q, N]-adjacent scale passes."""
    bias = (1.0 - mask.astype(jnp.float32)) * -1e30
    kf = k8.astype(jnp.bfloat16)
    vf = v8.astype(jnp.bfloat16)
    for h in range(HEADS):
        sl = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(
            q[:, sl], kf[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias
        m = jnp.max(s, -1, keepdims=True)
        e = jnp.exp2(s - m)
        den = jnp.sum(e, -1, keepdims=True)
        o_ref[:, sl] = (
            jnp.dot(e.astype(jnp.bfloat16), vf[:, sl],
                    preferred_element_type=jnp.float32) / den
        ).astype(o_ref.dtype)


def run_cache_dtype(name, kv_dtype, with_scales):
    """Race a quantized-cache read kernel at B programs."""
    if with_scales:
        def kern(q_ref, k_ref, v_ref, ks_ref, vs_ref, mask_ref, o_ref):
            body_q8(q_ref[0], k_ref[0], v_ref[0], ks_ref[0], vs_ref[0],
                    mask_ref[:], o_ref.at[0])
        extra_specs = [
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ]
    else:
        def kern(q_ref, k_ref, v_ref, mask_ref, o_ref):
            body_fp8(q_ref[0], k_ref[0], v_ref[0], mask_ref[:], o_ref.at[0])
        extra_specs = []

    f = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            *extra_specs,
            pl.BlockSpec((Q, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Q, H), jnp.bfloat16),
    )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Q, H)), jnp.bfloat16)
    kq = jnp.asarray(rng.integers(-127, 127, size=(B, N, H)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 127, size=(B, N, H)), jnp.int8)
    if kv_dtype != jnp.int8:
        kq = kq.astype(jnp.bfloat16).astype(kv_dtype)
        vq = vq.astype(jnp.bfloat16).astype(kv_dtype)
    ks = jnp.asarray(rng.random((B, 1, N)) * 0.01 + 0.001, jnp.float32)
    vs = jnp.asarray(rng.random((B, 1, N)) * 0.01 + 0.001, jnp.float32)
    mask = jnp.asarray(rng.random((Q, N)) > 0.3, jnp.int8)
    args = (q, kq, vq, ks, vs, mask) if with_scales else (q, kq, vq, mask)

    @jax.jit
    def many(*a):
        def step(c, _):
            o = f(a[0] + c.astype(jnp.bfloat16) * 0, *a[1:])
            return c + 1, o[0, 0, 0]
        c, ys = jax.lax.scan(step, jnp.asarray(0, jnp.int32), None, length=REPS)
        return ys

    out = many(*args)
    float(np.asarray(out).sum())
    t0 = time.time()
    out = many(*args)
    s = float(np.asarray(out).sum())
    dt = time.time() - t0
    per_call = dt / REPS * 1e6
    gbps = (2 * N * H * B) / (dt / REPS) / 1e9  # 1 byte/elem now
    print(f"{name:20s} B={B:3d} {per_call:8.1f} us/call   K+V read {gbps:7.1f} GB/s   (checksum {s:.1f})")


def run(body, name, batch=B, check_against=None):
    def kern(q_ref, k_ref, v_ref, mask_ref, o_ref):
        body(q_ref[0], k_ref[0], v_ref[0], mask_ref[:], o_ref.at[0])

    f = pl.pallas_call(
        kern,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, Q, H), jnp.bfloat16),
    )

    @jax.jit
    def many(q, k, v, mask):
        def step(c, _):
            o = f(q + c.astype(jnp.bfloat16) * 0, k, v, mask)
            return c + 1, o[0, 0, 0]

        c, ys = jax.lax.scan(step, jnp.asarray(0, jnp.int32), None, length=REPS)
        return ys

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(batch, Q, H)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(batch, N, H)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(batch, N, H)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((Q, N)) > 0.3, jnp.int8)

    out = many(q, k, v, mask)
    float(np.asarray(out).sum())  # force
    t0 = time.time()
    out = many(q, k, v, mask)
    s = float(np.asarray(out).sum())
    dt = time.time() - t0
    per_call = dt / REPS * 1e6
    gbps = (2 * N * H * 2 * batch) / (dt / REPS) / 1e9
    err = ""
    if check_against is not None:
        ref = np.asarray(jax.jit(lambda q, k, v, m: f(q, k, v, m))(q, k, v, mask))
        mx = np.abs(ref.astype(np.float32) - check_against).max()
        err = f"   max|d| vs full {mx:.4f}"
    print(
        f"{name:20s} B={batch:3d} {per_call:8.1f} us/call   "
        f"K+V read {gbps:7.1f} GB/s   (checksum {s:.1f}){err}"
    )
    return f, (q, k, v, mask)


def run_split(nsplit, name):
    """dma_only with the K/V read split over a 2D grid (B, nsplit) —
    do more outstanding block copies raise effective bandwidth?"""
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
    print(f"{name:20s} B={B:3d} {per_call:8.1f} us/call   K+V read {gbps:7.1f} GB/s")


def run_flash(nsplit, name, check_against=None):
    """Flash-decode grid (B, nsplit): each program reads an N/nsplit slab of
    K/V, accumulates un-normalized AV partials + denominators in VMEM
    scratch (exact without a running max — the clamp bounds exp2), and the
    last slab normalizes. Smaller DMA blocks -> deeper pipelining."""
    Nc = N // nsplit

    def kern(q_ref, k_ref, v_ref, bias_ref, o_ref, acc_ref, den_ref):
        n = pl.program_id(1)

        @pl.when(n == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            den_ref[...] = jnp.zeros_like(den_ref)

        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        bias = bias_ref[...]  # [Q, Nc] f32
        for h in range(HEADS):
            sl = slice(h * D, (h + 1) * D)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            e = jnp.exp2(jnp.minimum(s, 100.0) + bias).astype(v.dtype)
            acc_ref[:, sl] += jnp.dot(
                e, v[:, sl], preferred_element_type=jnp.float32
            )
            den_ref[h, :] += jnp.sum(e.astype(jnp.float32), axis=-1)

        @pl.when(n == nsplit - 1)
        def _final():
            for h in range(HEADS):
                sl = slice(h * D, (h + 1) * D)
                o_ref[0, :, sl] = (
                    acc_ref[:, sl]
                    / jnp.maximum(den_ref[h, :], 1e-30)[:, None]
                ).astype(o_ref.dtype)

    f = pl.pallas_call(
        kern,
        grid=(B, nsplit),
        in_specs=[
            pl.BlockSpec((1, Q, H), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nc, H), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nc, H), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, Nc), lambda b, n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q, H), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Q, H), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((Q, H), jnp.float32),
            pltpu.VMEM((HEADS, Q), jnp.float32),
        ],
    )

    @jax.jit
    def many(q, k, v, bias):
        def step(c, _):
            o = f(q + c.astype(jnp.bfloat16) * 0, k, v, bias)
            return c + 1, o[0, 0, 0]

        c, ys = jax.lax.scan(step, jnp.asarray(0, jnp.int32), None, length=REPS)
        return ys

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Q, H)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, N, H)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, N, H)), jnp.bfloat16)
    mask = rng.random((Q, N)) > 0.3
    bias = jnp.asarray(np.where(mask, 0.0, -1e30), jnp.float32)
    out = many(q, k, v, bias)
    float(np.asarray(out).sum())
    t0 = time.time()
    out = many(q, k, v, bias)
    s_ = float(np.asarray(out).sum())
    dt = time.time() - t0
    per_call = dt / REPS * 1e6
    gbps = (2 * N * H * 2 * B) / (dt / REPS) / 1e9
    err = ""
    if check_against is not None:
        got = np.asarray(
            jax.jit(lambda *a: f(*a))(q, k, v, bias)
        ).astype(np.float32)
        err = f"   max|d| vs full {np.abs(got - check_against).max():.4f}"
    print(f"{name:20s} B={B:3d} {per_call:8.1f} us/call   "
          f"K+V read {gbps:7.1f} GB/s   (checksum {s_:.1f}){err}")


def run_dma_pipe(nchunks, nbuf, name):
    """Round-4 lever (d): HAND-pipelined double-buffered HBM->VMEM copy.

    The automatic BlockSpec pipeline measured 433-455 GB/s for 2.4 MB/lane
    cache reads (55% of nameplate) and splitting its blocks didn't help
    (run_split). This probe bypasses it: K+V live in compiler-chosen (HBM)
    memory, and the kernel itself issues ``pltpu.make_async_copy`` chunk
    copies into an ``nbuf``-deep VMEM ring, overlapping chunk i's reduce
    with chunk i+nbuf-1's DMA. If this can't beat the automatic pipeline,
    the measured number is a genuine fabric/queue cap, not a pipelining
    artifact."""
    total = 2 * N  # one [B, 2N, H] stream stands in for K+V
    Nc = total // nchunks

    # q is a small counter-dependent input: without it the pallas call is
    # loop-invariant in the timing scan and XLA hoists it (one real call
    # per 200 "reps" — measured 1.2 TB/s, i.e. past the HBM nameplate)
    def kern(q_ref, x_hbm, o_ref):
        b = pl.program_id(0)

        def body(scratch, sem):
            def get_dma(slot, ci):
                return pltpu.make_async_copy(
                    x_hbm.at[b, pl.ds(ci * Nc, Nc), :],
                    scratch.at[slot],
                    sem.at[slot],
                )

            for i in range(min(nbuf - 1, nchunks)):
                get_dma(i, i).start()

            def loop_body(ci, acc):
                slot = ci % nbuf

                @pl.when(ci + nbuf - 1 < nchunks)
                def _():
                    get_dma((ci + nbuf - 1) % nbuf, ci + nbuf - 1).start()

                get_dma(slot, ci).wait()
                return acc + jnp.sum(scratch[slot].astype(jnp.float32), axis=0)

            acc = jax.lax.fori_loop(
                0, nchunks, loop_body, jnp.zeros((H,), jnp.float32)
            )
            o_ref[0, :, :] = (
                jnp.broadcast_to(acc[None, :], o_ref.shape[1:])
                + q_ref[0].astype(jnp.float32)
            ).astype(o_ref.dtype)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((nbuf, Nc, H), jnp.bfloat16),
            sem=pltpu.SemaphoreType.DMA((nbuf,)),
        )

    f = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Q, H), jnp.bfloat16),
    )

    @jax.jit
    def many(q, x):
        def step(c, _):
            o = f(q + c.astype(jnp.bfloat16) * 0, x)
            return c + 1, o[0, 0, 0]

        c, ys = jax.lax.scan(step, jnp.asarray(0, jnp.int32), None, length=REPS)
        return ys

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Q, H)), jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, total, H)), jnp.bfloat16)
    out = many(q, x)
    float(np.asarray(out).sum())
    t0 = time.time()
    out = many(q, x)
    s_ = float(np.asarray(out).sum())
    dt = time.time() - t0
    per_call = dt / REPS * 1e6
    gbps = (total * H * 2 * B) / (dt / REPS) / 1e9
    print(f"{name:20s} B={B:3d} {per_call:8.1f} us/call   "
          f"K+V read {gbps:7.1f} GB/s")


def run_block(lb, name, body=body_full):
    """Round-4: LB lanes per grid program. At packed shapes the per-lane
    K/V block shrinks (A=16 -> 1.57 MB) and per-program DMA efficiency
    drops (341 GB/s at 1.2 MB vs 440 at 2.4 MB); batching LB lanes per
    program restores big DMA blocks while the body loops over lanes."""
    def kern(q_ref, k_ref, v_ref, mask_ref, o_ref):
        for i in range(lb):
            body(q_ref[i], k_ref[i], v_ref[i], mask_ref[:], o_ref.at[i])

    f = pl.pallas_call(
        kern,
        grid=(B // lb,),
        in_specs=[
            pl.BlockSpec((lb, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lb, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
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
    float(np.asarray(out).sum())
    t0 = time.time()
    out = many(q, k, v, mask)
    s = float(np.asarray(out).sum())
    dt = time.time() - t0
    per_call = dt / REPS * 1e6
    gbps = (2 * N * H * 2 * B) / (dt / REPS) / 1e9
    print(f"{name:20s} B={B:3d} {per_call:8.1f} us/call   "
          f"K+V read {gbps:7.1f} GB/s   (checksum {s:.1f})")


def run_projfold(name, fold_out=True):
    """VERDICT r4 candidate: fold the new tokens' Q/K/V (and output)
    projections into the decode kernel, betting their MXU time hides under
    the K/V cache DMA. The body receives the raw token activations x [Q, H]
    plus Wqkv [H, 3H] / Wout [H, H] in VMEM (grid-invariant blocks), computes
    the projections per program, then runs the shipped-r3 attention body on
    the in-kernel q. K/V cache writes are NOT modeled (they are tiny DUS
    stores); this isolates the matmul-fold question: per-call time vs
    shipped_r3 at identical shapes."""

    def kern(x_ref, wqkv_ref, wout_ref, k_ref, v_ref, mask_ref, o_ref):
        x = x_ref[0]
        qkv = jnp.dot(
            x, wqkv_ref[:], preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        q = qkv[:, :H]
        # k/v of the new tokens: computed (cost modeled) but the attention
        # reads the cache operands, as production would
        _knew, _vnew = qkv[:, H : 2 * H], qkv[:, 2 * H :]
        k, v, mask = k_ref[0], v_ref[0], mask_ref[:]
        bias = mask.astype(jnp.float32) * 1e30 - 1e30
        outs = []
        for h in range(HEADS):
            sl = slice(h * D, (h + 1) * D)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            e = jnp.exp2(jnp.minimum(s, 100.0) + bias).astype(v.dtype)
            den = jnp.sum(e.astype(jnp.float32), -1, keepdims=True)
            outs.append(
                jnp.dot(e, v[:, sl], preferred_element_type=jnp.float32)
                / jnp.maximum(den, 1e-30)
            )
        out = jnp.concatenate(outs, axis=1).astype(jnp.bfloat16)
        if fold_out:
            out = jnp.dot(
                out + _knew * 0 + _vnew * 0,  # keep the k/v fold live
                wout_ref[:], preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        o_ref[0] = out

    f = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Q, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Q, H), jnp.bfloat16),
    )

    @jax.jit
    def many(x, wqkv, wout, k, v, mask):
        def step(c, _):
            o = f(x + c.astype(jnp.bfloat16) * 0, wqkv, wout, k, v, mask)
            return c + 1, o[0, 0, 0]

        c, ys = jax.lax.scan(step, jnp.asarray(0, jnp.int32), None, length=REPS)
        return ys

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, Q, H)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.06, jnp.bfloat16)
    wout = jnp.asarray(rng.normal(size=(H, H)) * 0.06, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, N, H)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, N, H)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((Q, N)) > 0.3, jnp.int8)

    out = many(x, wqkv, wout, k, v, mask)
    float(np.asarray(out).sum())
    t0 = time.time()
    out = many(x, wqkv, wout, k, v, mask)
    s = float(np.asarray(out).sum())
    dt = time.time() - t0
    per_call = dt / REPS * 1e6
    gbps = (2 * N * H * 2 * B) / (dt / REPS) / 1e9
    print(
        f"{name:20s} B={B:3d} {per_call:8.1f} us/call   "
        f"K+V read {gbps:7.1f} GB/s   (checksum {s:.1f})"
    )


def main():
    which = sys.argv[1:] or ["sweep"]
    print(f"Q={Q} N={N} H={H} heads={HEADS}, {REPS} reps under one jit")
    if "sweep" in which:
        run(body_dma_only, "dma_only")
        run(body_no_softmax, "no_softmax")
        f_full, args = run(body_full, "full")
        ref = np.asarray(
            jax.jit(lambda q, k, v, m: f_full(q, k, v, m))(*args)
        ).astype(np.float32)
        run(body_nomax, "nomax", check_against=ref)
        run(body_nomax_denomdot, "nomax_denomdot", check_against=ref)
        run(body_nomax_fp32av, "nomax_fp32av", check_against=ref)
        # body_allheads is unbuildable: Mosaic requires dot batch dims at
        # position 0, and hoisting heads to axis 0 costs full K/V transposes
    if "batch" in which:
        for b in (64, 128, 256):
            run(body_full, "full", batch=b)
    if "quant" in which:
        run(body_dma_only, "dma_only_bf16")
        run_cache_dtype("q8_scales", jnp.int8, True)
        try:
            run_cache_dtype("fp8_e4m3", jnp.float8_e4m3fn, False)
        except Exception as e:
            print(f"fp8_e4m3 failed: {type(e).__name__}: {str(e)[:200]}")
    if "split" in which:
        run_split(1, "dma_split1")
        run_split(2, "dma_split2")
        run_split(4, "dma_split4")
    if "stack" in which:
        f_full, args = run(body_full, "full")
        ref = np.asarray(
            jax.jit(lambda q, k, v, m: f_full(q, k, v, m))(*args)
        ).astype(np.float32)
        run(body_stackheads, "stackheads", check_against=ref)
    if "block" in which:
        run(body_full, "full_lb1")
        for lb in (2, 4):
            run_block(lb, f"full_lb{lb}")
    if "pipe" in which:
        run_split(1, "dma_split1")  # auto-pipeline baseline, same shapes
        for nchunks, nbuf in ((2, 2), (4, 2), (8, 2), (8, 4), (16, 4)):
            run_dma_pipe(nchunks, nbuf, f"dma_pipe{nchunks}x{nbuf}")
    if "r3" in which:
        f_full, args = run(body_full, "full")
        ref = np.asarray(
            jax.jit(lambda q, k, v, m: f_full(q, k, v, m))(*args)
        ).astype(np.float32)
        run(body_shipped_r3, "shipped_r3", check_against=ref)
        run(body_maxfree_denomdot, "maxfree_denomdot", check_against=ref)
        run_flash(2, "flash2", check_against=ref)
        run_flash(4, "flash4", check_against=ref)
        run_flash(8, "flash8", check_against=ref)
    if "projfold" in which:
        run(body_shipped_r3, "shipped_r3")
        run(body_shipped_concat, "shipped_concat")
        run_projfold("projfold_qkv_out", fold_out=True)
        run_projfold("projfold_qkv", fold_out=False)


if __name__ == "__main__":
    main()
