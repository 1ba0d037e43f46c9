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
