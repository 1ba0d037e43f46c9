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


def stream_step_masks(
    steps: int,
    window: int,
    num_agents: int,
    num_types: int,
    state_index: int,
    attend_own_return_action: bool = False,
) -> tuple[Array, Array]:
    """Precomputed per-step masks for the fused 2-pass streaming decode.

    The ring buffer's slot->timestep map is a closed form of the step
    index — slot s at step t holds label t - ((t - s) mod window), or -1
    before genesis — so the [Q, N] visibility masks the decoder builds per
    pass per step (models/decoder.py:decode_step_groups) can be hoisted out
    of the rollout scan entirely and streamed in as scan inputs.

    Returns ``(mask1 [T, 2A, N], mask2 [T, A, N])`` int8, N = window *
    num_types * num_agents: pass 1 = the t-1 action group + the t state
    group, pass 2 = the t rtg group (token type 1, or 0 under the DT
    layout — this helper covers the default CtRL-Sim layout where the rtg
    stream is type 1 and actions are type K-1). Bitwise equal to the
    decoder's dynamic construction (tests/test_masks.py)."""
    A, K, w = num_agents, num_types, window
    ts = jnp.arange(steps)
    s = jnp.arange(w)
    slot_label = ts[:, None] - jnp.mod(ts[:, None] - s[None, :], w)  # [T, w]
    slot_label = jnp.where(slot_label >= 0, slot_label, -1)

    a_j = jnp.tile(jnp.arange(A), w * K)  # [N]
    k_j = jnp.tile(jnp.repeat(jnp.arange(K), A), w)
    t_j = jnp.repeat(slot_label, K * A, axis=1)  # [T, N]
    jj = t_j * (A * K) + a_j[None, :] * K + k_j[None, :]

    def build(t_i_rows, k_i_rows):
        # t_i_rows/k_i_rows: [T, Q]
        a_i = jnp.tile(jnp.arange(A), t_i_rows.shape[1] // A)  # [Q]
        ii = t_i_rows * (A * K) + a_i[None, :] * K + k_i_rows
        m = visible(
            ti=t_i_rows[:, :, None],
            ai=a_i[None, :, None],
            ii=ii[:, :, None],
            tj=t_j[:, None, :],
            aj=a_j[None, None, :],
            kj=k_j[None, None, :],
            jj=jj[:, None, :],
            state_index=state_index,
            attend_own_return_action=attend_own_return_action,
            window=w,
        ) & (t_j[:, None, :] >= 0)
        return m.astype(jnp.int8)

    k_action = K - 1
    t1 = jnp.concatenate(
        [
            jnp.repeat((ts - 1)[:, None], A, axis=1),
            jnp.repeat(ts[:, None], A, axis=1),
        ],
        axis=1,
    )  # [T, 2A]
    k1 = jnp.concatenate(
        [jnp.full((steps, A), k_action), jnp.full((steps, A), state_index)],
        axis=1,
    )
    mask1 = build(t1, k1)

    t2 = jnp.repeat(ts[:, None], A, axis=1)
    k2 = jnp.full((steps, A), 1)  # rtg stream (default layout)
    mask2 = build(t2, k2)
    return mask1, mask2


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
