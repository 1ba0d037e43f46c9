"""Rollout-time sampling: exponentially tilted RTG sampling and
temperature / nucleus action sampling.

Port of Policy.process_predicted_rtg (policies/policy.py:108-142) and the
AutoregressivePolicy sampling block (policies/autoregressive_policy.py:209-240)
as batched pure functions: every lane and agent samples in parallel from its
own categorical, instead of one torch.multinomial call per vehicle per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def categorical_invcdf(rng: Array, logits: Array) -> Array:
    """Categorical sample over the last axis via inverse-CDF (one uniform
    per distribution + exp/cumsum/count). Identical distribution to
    ``jax.random.categorical``: P(i) = (cum_i - cum_{i-1}) / cum_{K-1}
    = softmax(logits)_i.

    MEASURED NEGATIVE RESULT on TPU v5e, kept for the record: 8x SLOWER than
    gumbel sampling (2453 us vs 294 us on [64, 24, 1000]) — ``jnp.cumsum``
    lowers to a log-width ladder of shifted adds, costing far more than the
    per-logit threefry + argmax it saves. The rollout samplers therefore use
    ``jax.random.categorical``. Retained for CPU-side tooling and as the
    distributional test oracle (tests/test_sampling.py).

    All-masked rows (every logit -inf/-1e30) sample *uniformly* (the max
    subtraction makes them all-equal) — same as softmax semantics; callers
    discard those rows via existence masks.
    """
    m = jnp.max(logits, axis=-1, keepdims=True)
    z = jnp.exp2((logits - m) * 1.4426950408889634)  # native exp2, no /sum
    cum = jnp.cumsum(z, axis=-1)
    u = jax.random.uniform(
        rng, logits.shape[:-1] + (1,), dtype=cum.dtype
    )
    # u*total in [0, total): count of cdf entries strictly below the draw
    return jnp.sum(cum < u * cum[..., -1:], axis=-1).astype(jnp.int32)


def sample_tilted_rtgs(
    rng: Array,
    rtg_logits: Array,  # [..., num_bins, 3]
    tilt_logits: Array,  # broadcastable to [..., num_bins, 3]
) -> Array:
    """Add tilt logits per component, softmax, sample one bin per component
    (policy.py:117-129). Returns integer bins [..., 3]."""
    tilted = rtg_logits.astype(jnp.float32) + tilt_logits
    # categorical over the bins axis, independently per component
    moved = jnp.moveaxis(tilted, -2, -1)  # [..., 3, num_bins]
    return jax.random.categorical(rng, moved, axis=-1)  # [..., 3]


def nucleus_filter(logits: Array, threshold: float) -> Array:
    """Top-p filtering (autoregressive_policy.py:217-231): keep the smallest
    prefix of descending-probability tokens whose cumulative mass reaches
    ``threshold`` (inclusive of the crossing token), renormalize."""
    probs = jax.nn.softmax(logits, axis=-1)
    sorted_probs = jnp.sort(probs, axis=-1)[..., ::-1]
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # selected mask in sorted order: first token always kept, then tokens
    # whose *previous* cumulative mass is < threshold
    prev_cum = jnp.concatenate(
        [jnp.zeros_like(cum[..., :1]), cum[..., :-1]], axis=-1
    )
    keep_sorted = prev_cum < threshold
    # map back to original order: token kept iff its prob >= the smallest
    # kept sorted prob (ties keep more mass than torch's arbitrary order —
    # an accepted distributional-parity deviation)
    num_keep = jnp.sum(keep_sorted, axis=-1, keepdims=True)
    kth = jnp.take_along_axis(sorted_probs, num_keep - 1, axis=-1)
    keep = probs >= kth
    neg = jnp.finfo(logits.dtype).min
    return jnp.where(keep, logits, neg)


def sample_actions(
    rng: Array,
    logits: Array,  # [..., num_actions]
    temperature: float = 1.0,
    nucleus: bool = False,
    nucleus_threshold: float = 0.8,
) -> Array:
    """Temperature + optional nucleus sampling -> action ids [...]."""
    scaled = logits.astype(jnp.float32) / temperature
    if nucleus:
        scaled = nucleus_filter(scaled, nucleus_threshold)
    return jax.random.categorical(rng, scaled, axis=-1)
