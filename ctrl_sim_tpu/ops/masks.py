"""Multi-agent causal attention mask as a closed-form predicate.

The reference materializes this mask with a Python double loop over all
(32*24*3)^2 = 5.3M index pairs (utils/train_utils.py:82-130). Token index
j = t*(A*K) + a*K + k, with K token types per agent per step. The loop's
fixed point reduces to a boolean formula over (t, a, k) coordinates, which
XLA evaluates as a handful of broadcasted integer ops — and which can be
evaluated *blockwise* inside a Pallas attention kernel without ever storing
the O(N^2) mask.

Derivation from the reference construction:

  base      = subsequent_mask MIN multi_agent_mask
            = j <= i  AND  (t_j < t_i OR a_j == a_i)
  stage 2   : all *state* tokens at t_j <= t_i become visible
  stage 3   (attend_own_return_action): past non-state tokens of *other*
              agents are re-masked.

  visible(i, j) =
      (k_j == state_index AND t_j <= t_i)
      OR (j <= i AND (t_j < t_i OR a_j == a_i)
          AND NOT (strict AND t_j < t_i AND a_j != a_i AND k_j != state_index))

An optional sliding ``window`` restricts keys to t_j > t_i - window, used by
the streaming rollout decoder (the training context is 32 steps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def token_coords(num_steps: int, num_agents: int, num_types: int):
    """(t, a, k) coordinates for every token index."""
    n = num_steps * num_agents * num_types
    idx = jnp.arange(n)
    t = idx // (num_agents * num_types)
    a = (idx // num_types) % num_agents
    k = idx % num_types
    return t, a, k


def visible(
    ti: Array,
    ai: Array,
    ii: Array,
    tj: Array,
    aj: Array,
    kj: Array,
    jj: Array,
    state_index: int,
    attend_own_return_action: bool = False,
    window: int | None = None,
) -> Array:
    """The visibility predicate for query coords (ti, ai, index ii) attending
    key coords (tj, aj, kj, index jj). Broadcasts."""
    state_vis = (kj == state_index) & (tj <= ti)
    base = (jj <= ii) & ((tj < ti) | (aj == ai))
    if attend_own_return_action:
        strict = (tj < ti) & (aj != ai) & (kj != state_index)
        base = base & ~strict
    out = state_vis | base
    if window is not None:
        out = out & (tj > ti - window)
    return out


def multi_agent_causal_mask(
    num_steps: int,
    num_agents: int,
    num_types: int,
    state_index: int = 0,
    attend_own_return_action: bool = False,
    window: int | None = None,
) -> Array:
    """Dense [N, N] boolean mask (True = attend), N = steps*agents*types.

    Equivalent to get_causal_mask (utils/train_utils.py:82-130) with
    0 -> True and -inf -> False.
    """
    t, a, k = token_coords(num_steps, num_agents, num_types)
    idx = jnp.arange(t.shape[0])
    return visible(
        t[:, None],
        a[:, None],
        idx[:, None],
        t[None, :],
        a[None, :],
        k[None, :],
        idx[None, :],
        state_index,
        attend_own_return_action,
        window,
    )
