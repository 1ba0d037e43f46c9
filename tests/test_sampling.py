"""Distributional tests for the inverse-CDF categorical sampler
(rollout/policy.py:categorical_invcdf) that replaced per-logit gumbel
sampling in the rollout hot path."""

import jax
import jax.numpy as jnp
import numpy as np

from ctrl_sim_tpu.rollout.policy import (
    categorical_invcdf,
    sample_actions,
    sample_tilted_rtgs,
)


def test_matches_softmax_distribution():
    logits = jnp.asarray([2.0, 0.0, -1.0, 3.0, 0.5, -30.0, 1.0, 0.0])
    probs = np.asarray(jax.nn.softmax(logits))
    n = 200_000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    draws = jax.jit(jax.vmap(lambda k: categorical_invcdf(k, logits)))(keys)
    freq = np.bincount(np.asarray(draws), minlength=8) / n
    # 4-sigma binomial bound per category
    sigma = np.sqrt(probs * (1 - probs) / n)
    assert np.all(np.abs(freq - probs) < 4 * sigma + 1e-4), (freq, probs)


def test_masked_logits_never_sampled():
    neg = jnp.finfo(jnp.float32).min
    logits = jnp.asarray([neg, 1.0, neg, 2.0, neg])
    keys = jax.random.split(jax.random.PRNGKey(1), 20_000)
    draws = np.asarray(
        jax.jit(jax.vmap(lambda k: categorical_invcdf(k, logits)))(keys)
    )
    assert set(np.unique(draws)) <= {1, 3}


def test_batch_axes_independent():
    """Each leading-batch row samples from its own distribution."""
    logits = jnp.stack(
        [
            jnp.asarray([100.0, 0.0, 0.0]),  # ~always 0
            jnp.asarray([0.0, 100.0, 0.0]),  # ~always 1
            jnp.asarray([0.0, 0.0, 100.0]),  # ~always 2
        ]
    )
    draws = categorical_invcdf(jax.random.PRNGKey(2), logits)
    np.testing.assert_array_equal(np.asarray(draws), [0, 1, 2])


def test_sample_actions_temperature_sharpens():
    logits = jnp.asarray([1.0, 0.0, 0.5, 0.2])
    keys = jax.random.split(jax.random.PRNGKey(3), 8000)
    cold = np.asarray(
        jax.vmap(lambda k: sample_actions(k, logits, temperature=0.05))(keys)
    )
    hot = np.asarray(
        jax.vmap(lambda k: sample_actions(k, logits, temperature=5.0))(keys)
    )
    assert (cold == 0).mean() > 0.99
    assert 0.15 < (hot == 0).mean() < 0.45  # near-uniform


def test_sample_tilted_rtgs_shifts_mass():
    """A positive tilt ramp moves sampled bins upward (Figure-4 semantics)."""
    B = 350
    rng = np.random.default_rng(0)
    rtg_logits = jnp.asarray(rng.normal(size=(2000, B, 3)), jnp.float32)
    ramp = jnp.linspace(0.0, 1.0, B)
    tilt_pos = jnp.stack([ramp * 10.0] * 3, axis=-1)
    keys = jax.random.PRNGKey(4)
    up = np.asarray(sample_tilted_rtgs(keys, rtg_logits, tilt_pos))
    flat = np.asarray(sample_tilted_rtgs(keys, rtg_logits, tilt_pos * 0.0))
    assert up.mean() > flat.mean() + 20.0


def test_all_masked_row_samples_uniform_finite():
    """Fully-masked rows (discarded by callers) must still return a valid
    in-range index, not garbage."""
    neg = jnp.full((4,), -1e30)
    keys = jax.random.split(jax.random.PRNGKey(5), 1000)
    draws = np.asarray(jax.vmap(lambda k: categorical_invcdf(k, neg))(keys))
    assert draws.min() >= 0 and draws.max() <= 3
