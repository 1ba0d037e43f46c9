"""Incremental (KV-cached) decode vs full-sequence decode equivalence.

The streaming rollout's performance rests on decode_step producing the same
outputs as the full decoder over the same token sequence. This test scripts
a fixed token stream (states/rtgs/actions over several timesteps), runs it
(a) through the full forward with the multi-agent causal mask, and
(b) step-by-step through stream_state/stream_rtg/stream_action,
and requires the head logits to match at every timestep — including after
the sliding window starts evicting cache entries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import load_config
from ctrl_sim_tpu.models.ctrl_sim import CtRLSim
from ctrl_sim_tpu.models.decoder import KVCache

CFG = load_config(
    {
        "model.hidden_dim": 32,
        "model.dim_feedforward": 48,
        "model.num_heads": 2,
        "model.num_decoder_layers": 2,
        "model.num_transformer_encoder_layers": 1,
        "model.dropout": 0.0,
        "model.compute_dtype": "float32",
        "waymo.train_context_length": 5,  # small window to test eviction
        "waymo.max_num_agents": 3,
        "waymo.max_num_road_polylines": 4,
        "waymo.max_num_road_pts_per_polyline": 6,
    }
)


@pytest.fixture(scope="module")
def setup():
    cfg = CFG
    wc = cfg.waymo
    B, A, T = 2, wc.max_num_agents, wc.train_context_length
    rng = np.random.default_rng(0)

    # scripted token stream over T steps (all agents exist); the trailing
    # 5 dims are agent-type one-hots and must be constant over time (the
    # full path broadcasts t=0 types)
    states12 = rng.normal(size=(B, A, T, 12)).astype(np.float32)
    states12[..., 7:12] = states12[:, :, :1, 7:12]
    data = {
        "states12": states12,
        "goals": rng.normal(size=(B, A, 5)).astype(np.float32),
        "actions": rng.integers(0, wc.action_dim, size=(B, A, T)),
        "rtgs": rng.integers(0, wc.rtg_discretization, size=(B, A, T, 3)),
        "road_points": np.concatenate(
            [
                rng.normal(size=(B, 4, 6, 2)).astype(np.float32),
                np.ones((B, 4, 6, 1), np.float32),
            ],
            axis=-1,
        ),
        "road_types": np.eye(8)[rng.integers(0, 8, size=(B, 4))].astype(np.float32),
    }

    # full-forward batch: agent_states carries 7 state dims + existence; the
    # encoder appends type one-hots itself, so split states12 accordingly
    batch = {
        "agent_states": np.concatenate(
            [data["states12"][..., :7], np.ones((B, A, T, 1), np.float32)], axis=-1
        ),
        "agent_types": data["states12"][:, :, 0, 7:12],
        "goals": data["goals"],
        "actions": data["actions"].astype(np.float32),
        "rtgs": data["rtgs"].astype(np.float32),
        "timesteps": np.tile(np.arange(T)[None], (B, 1)),
        "moving_agent_mask": np.ones((B, A), np.float32),
        "road_points": data["road_points"],
        "road_types": data["road_types"],
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    model = CtRLSim(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)
    return cfg, model, params, batch, data


def _full_logits(cfg, model, params, batch):
    preds = model.apply(params, batch, deterministic=True)
    wc = cfg.waymo
    B, A, T = batch["agent_states"].shape[:3]
    rtg_logits = preds.rtg_preds.reshape(B, A, T, wc.rtg_discretization, 3)
    return rtg_logits, preds.action_preds


def _streamed_logits(cfg, model, params, batch, data):
    wc, mc = cfg.waymo, cfg.model
    B, A, T = batch["agent_states"].shape[:3]
    window = wc.train_context_length
    H = mc.hidden_dim
    K = mc.num_token_types

    # memory must match the full path: built from t=0 state tokens
    states12 = jnp.asarray(data["states12"])
    goals = jnp.asarray(data["goals"])
    exist = jnp.ones((B, A))
    memory, memory_valid = model.apply(
        params,
        method=lambda m: m.encode_rollout_memory(
            batch["road_points"], batch["road_types"],
            states12[:, :, 0], goals, exist, jnp.asarray(0, jnp.int32),
        ),
    )

    cache = KVCache.create(mc.num_decoder_layers, B, window, A, K, H, jnp.float32)
    rtg_all, act_all = [], []
    for t in range(T):
        tt = jnp.asarray(t, jnp.int32)
        x_state, cache = model.apply(
            params,
            method=lambda m: m.stream_state(
                states12[:, :, t], goals, exist, tt, cache, memory,
                memory_valid, window,
            ),
        )
        rtg_all.append(
            model.apply(params, x_state, method=lambda m, x: m.rtg_head(x))
        )
        x_rtg, cache = model.apply(
            params,
            method=lambda m: m.stream_rtg(
                jnp.asarray(data["rtgs"][:, :, t]), exist, tt, cache, memory,
                memory_valid, window,
            ),
        )
        act_all.append(
            model.apply(params, x_rtg, method=lambda m, x: m.action_head(x))
        )
        _, cache = model.apply(
            params,
            method=lambda m: m.stream_action(
                jnp.asarray(data["actions"][:, :, t]), exist, tt, cache, memory,
                memory_valid, window,
            ),
        )
    wcd = cfg.waymo.rtg_discretization
    rtg = jnp.stack(rtg_all, axis=2).reshape(B, A, T, wcd, 3)
    act = jnp.stack(act_all, axis=2)
    return rtg, act


def _streamed_logits_fused(cfg, model, params, batch, data):
    """Same token stream through the 2-pass path the rollout uses: the
    previous step's action tokens fused with the state pass
    (stream_action_state), memory K/V pre-projected once."""
    wc, mc = cfg.waymo, cfg.model
    B, A, T = batch["agent_states"].shape[:3]
    window = wc.train_context_length
    K = mc.num_token_types

    states12 = jnp.asarray(data["states12"])
    goals = jnp.asarray(data["goals"])
    exist = jnp.ones((B, A))
    memory, memory_valid = model.apply(
        params,
        method=lambda m: m.encode_rollout_memory(
            batch["road_points"], batch["road_types"],
            states12[:, :, 0], goals, exist, jnp.asarray(0, jnp.int32),
        ),
    )
    memory_kv = model.apply(
        params, memory, method=lambda m, mem: m.precompute_memory_kv(mem)
    )

    cache = KVCache.create(
        mc.num_decoder_layers, B, window, A, K, mc.hidden_dim, jnp.float32
    )
    prev_actions = jnp.zeros((B, A), jnp.int32)
    prev_exist = jnp.zeros((B, A))
    rtg_all, act_all = [], []
    for t in range(T):
        tt = jnp.asarray(t, jnp.int32)
        x_state, cache = model.apply(
            params,
            method=lambda m: m.stream_action_state(
                prev_actions, prev_exist, states12[:, :, t], goals, exist,
                tt, cache, memory, memory_valid, window, memory_kv=memory_kv,
            ),
        )
        rtg_all.append(
            model.apply(params, x_state, method=lambda m, x: m.rtg_head(x))
        )
        x_rtg, cache = model.apply(
            params,
            method=lambda m: m.stream_rtg(
                jnp.asarray(data["rtgs"][:, :, t]), exist, tt, cache, memory,
                memory_valid, window, memory_kv=memory_kv,
            ),
        )
        act_all.append(
            model.apply(params, x_rtg, method=lambda m, x: m.action_head(x))
        )
        prev_actions = jnp.asarray(data["actions"][:, :, t], jnp.int32)
        prev_exist = exist
    wcd = cfg.waymo.rtg_discretization
    rtg = jnp.stack(rtg_all, axis=2).reshape(B, A, T, wcd, 3)
    act = jnp.stack(act_all, axis=2)
    return rtg, act


class TestStreamingEquivalence:
    def test_matches_full_decode_within_window(self, setup):
        cfg, model, params, batch, data = setup
        full_rtg, full_act = _full_logits(cfg, model, params, batch)
        s_rtg, s_act = _streamed_logits(cfg, model, params, batch, data)
        np.testing.assert_allclose(
            np.asarray(s_rtg), np.asarray(full_rtg), atol=2e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(s_act), np.asarray(full_act), atol=2e-4, rtol=1e-4
        )

    def test_fused_action_state_pass_matches_sequential(self, setup):
        """The rollout's 2-pass decode (prev-action tokens fused with the
        state pass, pre-projected memory K/V) must produce the same head
        logits as the full decode within the window (no eviction -> the
        deferred action write is semantically identical)."""
        cfg, model, params, batch, data = setup
        full_rtg, full_act = _full_logits(cfg, model, params, batch)
        f_rtg, f_act = _streamed_logits_fused(cfg, model, params, batch, data)
        np.testing.assert_allclose(
            np.asarray(f_rtg), np.asarray(full_rtg), atol=2e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(f_act), np.asarray(full_act), atol=2e-4, rtol=1e-4
        )

    def test_window_eviction_single_layer(self, setup):
        """Stream 2*window steps with a SINGLE decoder layer; the last step's
        logits must equal a full decode over the trailing window.

        (With multiple layers the sliding-window cache gives deeper layers a
        Transformer-XL-style receptive field that grows with depth — slightly
        *more* context than the reference's re-built window, an accepted
        streaming-mode deviation. With one layer the equivalence is exact,
        which pins down the ring-buffer eviction logic.)
        """
        cfg, _, _, batch, data = setup
        cfg = load_config(
            dict(
                {
                    "model.hidden_dim": 32,
                    "model.dim_feedforward": 48,
                    "model.num_heads": 2,
                    "model.num_decoder_layers": 1,
                    "model.num_transformer_encoder_layers": 1,
                    "model.dropout": 0.0,
                    "model.compute_dtype": "float32",
                    "waymo.train_context_length": 5,
                    "waymo.max_num_agents": 3,
                    "waymo.max_num_road_polylines": 4,
                    "waymo.max_num_road_pts_per_polyline": 6,
                }
            )
        )
        model = CtRLSim(cfg)
        params = model.init({"params": jax.random.PRNGKey(0)}, batch)
        wc, mc = cfg.waymo, cfg.model
        B, A, T = batch["agent_states"].shape[:3]
        window = wc.train_context_length
        rng = np.random.default_rng(1)
        T2 = 2 * window

        s12 = rng.normal(size=(B, A, T2, 12)).astype(np.float32)
        s12[..., 7:12] = s12[:, :, :1, 7:12]  # constant agent types over time
        long = {
            "states12": s12,
            "actions": rng.integers(0, wc.action_dim, size=(B, A, T2)),
            "rtgs": rng.integers(0, wc.rtg_discretization, size=(B, A, T2, 3)),
        }
        goals = jnp.asarray(data["goals"])
        exist = jnp.ones((B, A))
        memory, memory_valid = model.apply(
            params,
            method=lambda m: m.encode_rollout_memory(
                batch["road_points"], batch["road_types"],
                jnp.asarray(long["states12"][:, :, 0]), goals, exist,
                jnp.asarray(0, jnp.int32),
            ),
        )
        cache = KVCache.create(
            mc.num_decoder_layers, B, window, A, mc.num_token_types,
            mc.hidden_dim, jnp.float32,
        )
        last_rtg = None
        for t in range(T2):
            tt = jnp.asarray(t, jnp.int32)
            x_state, cache = model.apply(
                params,
                method=lambda m: m.stream_state(
                    jnp.asarray(long["states12"][:, :, t]), goals, exist, tt,
                    cache, memory, memory_valid, window,
                ),
            )
            last_rtg = model.apply(
                params, x_state, method=lambda m, x: m.rtg_head(x)
            )
            _, cache = model.apply(
                params,
                method=lambda m: m.stream_rtg(
                    jnp.asarray(long["rtgs"][:, :, t]), exist, tt, cache,
                    memory, memory_valid, window,
                ),
            )
            _, cache = model.apply(
                params,
                method=lambda m: m.stream_action(
                    jnp.asarray(long["actions"][:, :, t]), exist, tt, cache,
                    memory, memory_valid, window,
                ),
            )

        # full decode of the last `window` steps with true timesteps
        w0 = T2 - window
        ref_batch = {
            "agent_states": jnp.concatenate(
                [
                    jnp.asarray(long["states12"][:, :, w0:, :7]),
                    jnp.ones((B, A, window, 1)),
                ],
                axis=-1,
            ),
            "agent_types": jnp.asarray(long["states12"][:, :, 0, 7:12]),
            "goals": goals,
            "actions": jnp.asarray(long["actions"][:, :, w0:]).astype(jnp.float32),
            "rtgs": jnp.asarray(long["rtgs"][:, :, w0:]).astype(jnp.float32),
            "timesteps": jnp.tile(jnp.arange(w0, T2)[None], (B, 1)),
            "moving_agent_mask": jnp.ones((B, A)),
            "road_points": batch["road_points"],
            "road_types": batch["road_types"],
        }
        # the full path re-derives the memory from *its* first window step;
        # to compare apples to apples, decode with the streaming memory
        enc = model.bind(params).encoder(ref_batch, True)
        out = model.bind(params).decoder(
            enc.stacked_embeddings, memory, memory_valid,
            num_timesteps=window, deterministic=True,
        )
        full_rtg_last = out.rtg_preds[:, :, -1]
        np.testing.assert_allclose(
            np.asarray(last_rtg), np.asarray(full_rtg_last), atol=3e-4, rtol=1e-3
        )


def test_project_qkv_matches_separate_projections():
    """The fused [D, 3D] QKV matmul (round 5, decode_step) must be
    BIT-identical to the three separate Dense projections in f32 on CPU:
    each output column block is the same dot product over the same
    contraction order, so any deviation means the concatenation wired a
    wrong block order."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ctrl_sim_tpu.models.layers import MultiHeadAttention

    mha = MultiHeadAttention(num_heads=4, d_model=64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 64)), jnp.float32)
    params = mha.init(jax.random.PRNGKey(0), x, x, x)

    def fused(p, x):
        q, k, v = mha.apply(p, x, method=MultiHeadAttention.project_qkv)
        return q, k, v

    def separate(p, x):
        q = mha.apply(
            p, x, method=lambda m, y: m.q_proj(y)
        )
        k, v = mha.apply(p, x, x, method=MultiHeadAttention.project_kv)
        return q, k, v

    for got, want, name in zip(fused(params, x), separate(params, x), "qkv"):
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want), err_msg=name
        )
