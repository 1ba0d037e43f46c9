"""Closed-form causal mask vs a direct numpy port of the reference's
O(N^2) loop construction (utils/train_utils.py:82-130)."""

import numpy as np
import pytest

from ctrl_sim_tpu.ops.masks import multi_agent_causal_mask


def reference_mask(num_steps, num_agents, num_types, state_index, attend_own):
    """Direct port of get_causal_mask with 0 -> True, -inf -> False."""
    n = num_agents * num_steps * num_types
    NEG = -np.inf
    # torch generate_square_subsequent_mask: 0 on/below diagonal
    mask = np.where(np.tril(np.ones((n, n))) > 0, 0.0, NEG)

    multi = np.zeros((n, n))
    offset = 0
    for index in range(n):
        mask_out = np.full(num_agents * num_types, NEG)
        agent_id = (index // num_types) % num_agents
        mask_out[agent_id * num_types : (agent_id + 1) * num_types] = 0
        multi[index, offset : offset + num_agents * num_types] = mask_out
        if (index + 1) % (num_agents * num_types) == 0:
            offset += num_agents * num_types
    mask = np.minimum(mask, multi)

    for i in range(n):
        timestep_idx = i // (num_types * num_agents)
        for j in range(n):
            if j < (timestep_idx + 1) * (num_agents * num_types) and j % num_types == state_index:
                mask[i, j] = 0.0

    if attend_own:
        for i in range(n):
            agent_i = (i // num_types) % num_agents
            t_i = i // (num_types * num_agents)
            for j in range(n):
                agent_j = (j // num_types) % num_agents
                t_j = j // (num_types * num_agents)
                type_j = j % 3  # reference hardcodes 3 here
                if t_j < t_i and agent_i != agent_j and type_j != state_index:
                    mask[i, j] = NEG
    return mask == 0.0


@pytest.mark.parametrize(
    "steps,agents,types,state_index,attend_own",
    [
        (4, 3, 3, 0, False),  # ctrl_sim default
        (4, 3, 3, 1, False),  # decision transformer layout
        (4, 3, 3, 0, True),  # attend_own_return_action
        (4, 3, 1, 0, False),  # trajeglish
        (4, 3, 2, 0, False),  # IL
        (3, 5, 3, 0, False),
    ],
)
def test_matches_reference_loop(steps, agents, types, state_index, attend_own):
    want = reference_mask(steps, agents, types, state_index, attend_own)
    got = np.asarray(
        multi_agent_causal_mask(steps, agents, types, state_index, attend_own)
    )
    np.testing.assert_array_equal(got, want)


def test_window_restricts_past():
    full = np.asarray(multi_agent_causal_mask(6, 2, 3, 0))
    windowed = np.asarray(multi_agent_causal_mask(6, 2, 3, 0, window=2))
    n = 6 * 2 * 3
    t = np.arange(n) // (2 * 3)
    expect = full & (t[None, :] > t[:, None] - 2)
    np.testing.assert_array_equal(windowed, expect)


@pytest.mark.parametrize("attend_own", [False, True])
@pytest.mark.parametrize("steps,window", [(9, 4), (3, 8)])
def test_stream_step_masks_match_dynamic_ring(steps, window, attend_own):
    """stream_step_masks (precomputed outside the rollout scan) must equal
    the decoder's dynamic construction (decode_step_groups) at every step —
    the ring slot->timestep labels are simulated here exactly as the
    carried slot_t evolves. Parametrized over attend_own_return_action
    (run_streaming premasks any default-family config, ADVICE r4) and a
    steps < window episode (ring never wraps)."""
    import numpy as np

    from ctrl_sim_tpu.ops.masks import stream_step_masks, visible

    A, K, state_index = 3, 3, 0
    m1, m2 = stream_step_masks(steps, window, A, K, state_index, attend_own)
    m1, m2 = np.asarray(m1), np.asarray(m2)

    def dynamic(slot_t, queries):
        a_j = np.tile(np.arange(A), window * K)
        k_j = np.tile(np.repeat(np.arange(K), A), window)
        t_j = np.repeat(np.asarray(slot_t), K * A)
        jj = t_j * (A * K) + a_j * K + k_j
        t_i = np.concatenate([np.full(A, tg) for tg, _ in queries])
        k_i = np.concatenate([np.full(A, k) for _, k in queries])
        a_i = np.tile(np.arange(A), len(queries))
        ii = t_i * (A * K) + a_i * K + k_i
        m = np.asarray(
            visible(
                ti=t_i[:, None], ai=a_i[:, None], ii=ii[:, None],
                tj=t_j[None, :], aj=a_j[None, :], kj=k_j[None, :],
                jj=jj[None, :], state_index=state_index,
                attend_own_return_action=attend_own, window=window,
            )
        ) & (t_j[None, :] >= 0)
        return m.astype(np.int8)

    slot_t = np.full(window, -1)
    for t in range(steps):
        # pass 1 writes (action @ t-1, state @ t), labels only for t >= 0
        for tg in (t - 1, t):
            if tg >= 0:
                slot_t[tg % window] = tg
        np.testing.assert_array_equal(
            m1[t], dynamic(slot_t, [(t - 1, K - 1), (t, state_index)]),
            err_msg=f"pass-1 mask differs at t={t}",
        )
        # pass 2 writes rtg @ t (slot already labeled t)
        np.testing.assert_array_equal(
            m2[t], dynamic(slot_t, [(t, 1)]),
            err_msg=f"pass-2 mask differs at t={t}",
        )
