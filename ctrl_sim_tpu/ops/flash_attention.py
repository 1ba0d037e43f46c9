"""Pallas flash attention for training: multi-agent causal mask in-kernel.

Why this kernel exists: the training decoder runs self-attention over
T = 32 steps x 24 agents x 3 token types = 2304 tokens with the multi-agent
causal mask (reference: utils/train_utils.py:82-130, nn.TransformerDecoder
tgt_mask). XLA's dense path materializes [B, heads, T, T] fp32 scores —
2.7 GB per layer at microbatch 16 — which both OOMs the full global batch
and moves ~25 GB of HBM traffic per layer pass. This kernel:

- never materializes the mask: the visibility predicate (ops/masks.py) is
  evaluated blockwise from broadcasted iotas inside the kernel;
- never writes scores to HBM: softmax is computed per 128-row query block
  against the full key range held in VMEM (at T=2304, D=256 the whole K/V
  fits on-chip, so no online-softmax carry is needed);
- reads K/V in their native [T, D] layout and splits heads with static VMEM
  slices (head_dim 32 < the 128-lane tile, so a [T, heads, 32] reshape would
  force a full HBM re-layout — same pathology ops/attention.py fixes for
  the decode path);
- implements attention dropout with a counter-based hash (murmur3 finalizer
  over (seed, batch, head, global row, global col)) so the backward pass
  regenerates the identical keep mask with any block size — and so the CPU
  interpret-mode tests cover the dropout path (pltpu.prng_* does not lower
  in interpret mode);
- fuses the backward into one kernel: dq is produced per query block, and
  dk/dv are accumulated across query blocks in VMEM f32 scratch-outputs
  whose index map is constant along the query-block grid axis.

The custom VJP makes the kernel differentiable under `jax.grad` and
compatible with `nn.remat` (the decoder layers rematerialize; the flash
forward is cheap to replay).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctrl_sim_tpu.ops import masks

Array = jax.Array

_NEG = -1e30  # large-negative instead of -inf: keeps padded rows NaN-free


class MaskSpec(NamedTuple):
    """Static description of the multi-agent causal mask (hashable, so it can
    be a nondiff/static argument). Token index j = t*(A*K) + a*K + k."""

    num_agents: int
    num_types: int
    state_index: int
    attend_own_return_action: bool
    window: int | None


def _coords(idx: Array, spec: MaskSpec) -> tuple[Array, Array, Array]:
    ak = spec.num_agents * spec.num_types
    t = idx // ak
    a = (idx // spec.num_types) % spec.num_agents
    k = idx % spec.num_types
    return t, a, k


def _block_mask(rows: Array, cols: Array, seq_len: int, spec: MaskSpec) -> Array:
    """Visibility predicate for global query indices `rows` [bq, 1] attending
    key indices `cols` [1, T], plus bounds masking of padded rows/cols."""
    ti, ai, _ = _coords(rows, spec)
    tj, aj, kj = _coords(cols, spec)
    vis = masks.visible(
        ti=ti,
        ai=ai,
        ii=rows,
        tj=tj,
        aj=aj,
        kj=kj,
        jj=cols,
        state_index=spec.state_index,
        attend_own_return_action=spec.attend_own_return_action,
        window=spec.window,
    )
    return vis & (rows < seq_len) & (cols < seq_len)


def _dropout_keep(
    seed: Array, b: Array, h: int, rows: Array, cols: Array, keep_prob: float
) -> Array:
    """Deterministic position-keyed keep mask: murmur3 finalizer over
    (seed, batch, head, row, col). Identical bits in forward and backward
    regardless of how the [row, col] plane is blocked."""
    u = jnp.uint32
    x = rows.astype(u) * u(0x9E3779B1) ^ cols.astype(u) * u(0x85EBCA77)
    x = x ^ (b.astype(u) * u(0xC2B2AE3D)) ^ (u(h) * u(0x27D4EB2F)) ^ seed
    x = x ^ (x >> u(16))
    x = x * u(0x85EBCA6B)
    x = x ^ (x >> u(13))
    x = x * u(0xC2B2AE35)
    x = x ^ (x >> u(16))
    threshold = u(min(int(keep_prob * 2 ** 32), 2 ** 32 - 1))
    return x < threshold


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    spec: MaskSpec,
    num_heads: int,
    dropout_p: float,
    seq_len: int,
    block_q: int,
    q_ref,
    k_ref,
    v_ref,
    seed_ref,
    o_ref,
    lse_ref,
):
    b = pl.program_id(0)
    qi = pl.program_id(1)
    q = q_ref[0]  # [bq, D]
    D = q.shape[-1]
    hd = D // num_heads
    scale = 1.0 / (hd ** 0.5)

    rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    T = k_ref.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    mask = _block_mask(rows, cols, seq_len, spec)
    seed = seed_ref[0]

    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q[:, sl].astype(jnp.float32)
        kh = k_ref[0, :, sl].astype(jnp.float32)
        vh = v_ref[0, :, sl].astype(jnp.float32)
        s = (
            jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # [bq, T]
        s = jnp.where(mask, s, _NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        lse_ref[0, h, :] = (m + jnp.log(l))[:, 0]
        p = p / l
        if dropout_p > 0.0:
            keep = _dropout_keep(seed, b, h, rows, cols, 1.0 - dropout_p)
            p = jnp.where(keep, p / (1.0 - dropout_p), 0.0)
        o = jnp.dot(p, vh, preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# backward (fused dq + accumulated dk/dv)
# ---------------------------------------------------------------------------


def _bwd_kernel(
    spec: MaskSpec,
    num_heads: int,
    dropout_p: float,
    seq_len: int,
    block_q: int,
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    do_ref,
    lse_ref,
    seed_ref,
    dq_ref,
    dk_ref,
    dv_ref,
):
    b = pl.program_id(0)
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_ref[:] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[:] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    q = q_ref[0]
    D = q.shape[-1]
    hd = D // num_heads
    scale = 1.0 / (hd ** 0.5)

    rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    T = k_ref.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    mask = _block_mask(rows, cols, seq_len, spec)
    seed = seed_ref[0]
    # the final query block may be padded: its out-of-range rows contain
    # garbage (NaN in interpret mode) that would poison the dk/dv row
    # contractions through 0 * NaN — zero those rows at the inputs
    row_valid = rows < seq_len  # [bq, 1]

    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = jnp.where(row_valid, q[:, sl].astype(jnp.float32), 0.0)
        kh = k_ref[0, :, sl].astype(jnp.float32)
        vh = v_ref[0, :, sl].astype(jnp.float32)
        oh = jnp.where(row_valid, o_ref[0, :, sl].astype(jnp.float32), 0.0)
        doh = jnp.where(row_valid, do_ref[0, :, sl].astype(jnp.float32), 0.0)
        lse = lse_ref[0, h, :][:, None]  # [bq, 1]

        s = (
            jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        # p = softmax row weights; masked/padded positions exactly zero
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)  # [bq, T]
        if dropout_p > 0.0:
            keep = _dropout_keep(seed, b, h, rows, cols, 1.0 - dropout_p)
            pd = jnp.where(keep, p / (1.0 - dropout_p), 0.0)
        else:
            keep = None
            pd = p

        delta = jnp.sum(doh * oh, axis=-1, keepdims=True)  # [bq, 1]
        dpd = jax.lax.dot_general(
            doh, vh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, T]
        if dropout_p > 0.0:
            dp = jnp.where(keep, dpd / (1.0 - dropout_p), 0.0)
        else:
            dp = dpd
        ds = p * (dp - delta) * scale  # [bq, T]

        dq_ref[0, :, sl] = jnp.dot(
            ds, kh, preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dk_ref[0, :, sl] += jax.lax.dot_general(
            ds, qh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv_ref[0, :, sl] += jax.lax.dot_general(
            pd, doh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------


def _fwd_call(spec, num_heads, dropout_p, block_q, interpret, q, k, v, seed):
    B, T, D = q.shape
    nq = pl.cdiv(T, block_q)
    kern = functools.partial(_fwd_kernel, spec, num_heads, dropout_p, T, block_q)
    out, lse = pl.pallas_call(
        kern,
        grid=(B, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, block_q), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, num_heads, T), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, seed)
    return out, lse


def _bwd_call(spec, num_heads, dropout_p, block_q, interpret, q, k, v, o, do, lse, seed):
    B, T, D = q.shape
    nq = pl.cdiv(T, block_q)
    kern = functools.partial(_bwd_kernel, spec, num_heads, dropout_p, T, block_q)
    blk = lambda b, i: (b, i, 0)
    full = lambda b, i: (b, 0, 0)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(B, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, block_q), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), blk, memory_space=pltpu.VMEM),
            # constant index along the query axis: the f32 accumulators live
            # in VMEM across all query blocks of one batch lane
            pl.BlockSpec((1, T, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, T, D), jnp.float32),
            jax.ShapeDtypeStruct((B, T, D), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, o, do, lse, seed)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _flash(spec, num_heads, dropout_p, block_q, interpret, q, k, v, seed):
    out, _ = _fwd_call(spec, num_heads, dropout_p, block_q, interpret, q, k, v, seed)
    return out


def _flash_fwd(spec, num_heads, dropout_p, block_q, interpret, q, k, v, seed):
    out, lse = _fwd_call(spec, num_heads, dropout_p, block_q, interpret, q, k, v, seed)
    return out, (q, k, v, out, lse, seed)


def _flash_bwd(spec, num_heads, dropout_p, block_q, interpret, res, g):
    q, k, v, out, lse, seed = res
    dq, dk, dv = _bwd_call(
        spec, num_heads, dropout_p, block_q, interpret, q, k, v, out,
        g.astype(q.dtype), lse, seed,
    )
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_mha(
    q: Array,  # [B, T, D] post-projection, heads packed in D
    k: Array,  # [B, T, D]
    v: Array,  # [B, T, D]
    spec: MaskSpec,
    num_heads: int,
    dropout_p: float = 0.0,
    seed: Array | None = None,
    block_q: int = 128,
    interpret: bool = False,
) -> Array:
    """Multi-head attention under the multi-agent causal mask, O(T) memory.

    Differentiable (custom VJP). ``seed`` (uint32 [1]) is only consumed when
    ``dropout_p > 0``; the same seed reproduces the same keep mask.
    """
    B, T, D = q.shape
    if D % num_heads:
        raise ValueError("feature dim must divide num_heads")
    if seed is None:
        seed = jnp.zeros((1,), jnp.uint32)
    block_q = min(block_q, max(8, T))
    return _flash(
        spec, num_heads, float(dropout_p), int(block_q), bool(interpret),
        q, k, v, seed.astype(jnp.uint32),
    )
