"""CtRL-Sim model: encoder + multi-agent causal decoder + masked losses.

flax.linen re-build of models/ctrl_sim.py (reference): the same
return-conditioned autoregressive transformer over interleaved
state/return/action tokens, with DT / IL / trajeglish as token-layout
variants selected by config flags. Losses replicate compute_loss
(models/ctrl_sim.py:48-189) with the Python shift-loop replaced by a
vectorized gather.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.models.decoder import Decoder, DecoderOutput
from ctrl_sim_tpu.models.encoder import Encoder

Array = jax.Array


class CtRLSim(nn.Module):
    cfg: Config

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)

    def __call__(
        self, batch: dict, deterministic: bool = True, window: int | None = None
    ) -> DecoderOutput:
        enc = self.encoder(batch, deterministic)
        T = batch["agent_states"].shape[2]
        return self.decoder(
            enc.stacked_embeddings,
            enc.encoder_embeddings,
            enc.memory_valid,
            num_timesteps=T,
            deterministic=deterministic,
            window=window,
        )

    # ------------------------------------------------------------------
    # streaming rollout interface (incremental KV-cached decode)
    # ------------------------------------------------------------------
    def encode_rollout_memory(
        self,
        road_points: Array,
        road_types: Array,
        init_states12: Array,  # [B, A, 12]
        init_goals: Array,  # [B, A, goal_dim]
        init_exist: Array,  # [B, A]
        t0: Array,  # scalar int32 — episode start step
    ) -> tuple[Array, Array]:
        """Encode the cross-attention memory once per episode: map polylines
        + initial-state tokens (encoder.py:155-172)."""
        A = init_states12.shape[1]
        a_ids = jnp.broadcast_to(
            jnp.arange(A)[None, :], init_states12.shape[:2]
        ).astype(jnp.int32)
        t_ids = jnp.full_like(a_ids, t0)
        init_emb = self.encoder.embed_state_tokens(
            init_states12, init_goals, t_ids, a_ids, init_exist[..., None]
        )
        return self.encoder.encode_memory(
            road_points, road_types, init_emb, init_exist > 0
        )

    def precompute_memory_kv(self, memory: Array) -> tuple:
        """Per-layer cross-attention K/V of the static episode memory,
        projected once per episode (see Decoder.memory_kv)."""
        return self.decoder.memory_kv(memory)

    def stream_state(
        self,
        states12: Array,  # [B, A, 12]
        goals: Array,  # [B, A, goal_dim]
        existence: Array,  # [B, A]
        t: Array,
        cache,
        memory: Array,
        memory_valid: Array,
        window: int,
        memory_kv: tuple | None = None,
    ):
        """Append this step's state tokens; return (state-stream outputs
        [B, A, H] -> feed to the RTG head, updated cache)."""
        A = states12.shape[1]
        a_ids = jnp.broadcast_to(jnp.arange(A)[None, :], states12.shape[:2]).astype(jnp.int32)
        t_ids = jnp.full_like(a_ids, t)
        emb = self.encoder.embed_state_tokens(
            states12, goals, t_ids, a_ids, existence[..., None]
        )
        emb = self.encoder.embed_ln(emb)
        return self.decoder.decode_step(
            emb, self.cfg.model.state_token_index, t, cache, memory,
            memory_valid, window, memory_kv=memory_kv,
        )

    def stream_action_state(
        self,
        prev_actions: Array,  # [B, A] discrete ids applied at step t-1
        prev_existence: Array,  # [B, A] existence mask at step t-1
        states12: Array,  # [B, A, 12] current step's states
        goals: Array,  # [B, A, goal_dim]
        existence: Array,  # [B, A]
        t: Array,
        cache,
        memory: Array,
        memory_valid: Array,
        window: int,
        memory_kv: tuple | None = None,
        mask_override = None,
    ):
        """Fused sub-pass: append the PREVIOUS step's action tokens together
        with this step's state tokens in one decoder pass.

        The action tokens of step t-1 are only needed in the cache (their
        head outputs are discarded in rollout), so deferring their decode to
        step t and batching it with the state pass halves the number of
        full KV-cache reads per env step — the streaming rollout's dominant
        cost. The causal mask keeps the two groups correctly ordered: state
        queries at t see the t-1 action keys, action queries at t-1 do not
        see the t state keys. At t = 0 the action group carries timestep -1
        and stays fully masked (slot_t label -1) until its slot is genuinely
        overwritten.

        One documented deviation vs the sequential 3-pass decode: the t-1
        action tokens are written after the ring slot for t-window has been
        overwritten by this step's states, so their own receptive field
        misses that single oldest timestep (window-1 instead of window
        steps of history). Returns (state-stream outputs [B, A, H], cache).
        """
        A = states12.shape[1]
        a_ids = jnp.broadcast_to(jnp.arange(A)[None, :], states12.shape[:2]).astype(jnp.int32)
        t_prev = t - 1
        emb_a = self.encoder.embed_action_tokens(
            prev_actions,
            jnp.full_like(a_ids, jnp.maximum(t_prev, 0)),
            a_ids,
            prev_existence[..., None],
        )
        emb_s = self.encoder.embed_state_tokens(
            states12, goals, jnp.full_like(a_ids, t), a_ids, existence[..., None]
        )
        emb = self.encoder.embed_ln(jnp.concatenate([emb_a, emb_s], axis=1))
        k_action = self.cfg.model.num_token_types - 1
        x, cache = self.decoder.decode_step_groups(
            [
                (emb[:, :A], k_action, t_prev),
                (emb[:, A:], self.cfg.model.state_token_index, t),
            ],
            cache,
            memory,
            memory_valid,
            window,
            memory_kv=memory_kv,
            mask_override=mask_override,
        )
        return x[:, A:], cache

    def stream_prev_action(
        self,
        prev_actions: Array,  # [B, A] discrete ids applied at step t-1
        prev_existence: Array,  # [B, A]
        t: Array,
        cache,
        memory: Array,
        memory_valid: Array,
        window: int,
        memory_kv: tuple | None = None,
    ):
        """Sequential 3-pass variant of the action deferral
        (eval.streaming_passes=3): the t-1 action tokens are decoded in
        their OWN pass BEFORE this step's state tokens overwrite the
        t-window ring slot, so their receptive field covers the full
        window — matching the reference's sequential decode order
        (autoregressive_policy.py:189-210) at 1.5x the fused path's cache
        traffic. Outputs are discarded; only the cache write matters."""
        A = prev_actions.shape[1]
        a_ids = jnp.broadcast_to(
            jnp.arange(A)[None, :], prev_actions.shape[:2]
        ).astype(jnp.int32)
        t_prev = t - 1
        emb = self.encoder.embed_action_tokens(
            prev_actions,
            jnp.full_like(a_ids, jnp.maximum(t_prev, 0)),
            a_ids,
            prev_existence[..., None],
        )
        emb = self.encoder.embed_ln(emb)
        k = self.cfg.model.num_token_types - 1
        return self.decoder.decode_step(
            emb, k, t_prev, cache, memory, memory_valid, window,
            memory_kv=memory_kv,
        )

    def stream_rtg(
        self,
        rtg_bins: Array,  # [B, A, 3]
        existence: Array,
        t: Array,
        cache,
        memory: Array,
        memory_valid: Array,
        window: int,
        memory_kv: tuple | None = None,
        mask_override = None,
    ):
        """Append this step's RTG tokens; outputs feed the action head."""
        A = rtg_bins.shape[1]
        a_ids = jnp.broadcast_to(jnp.arange(A)[None, :], rtg_bins.shape[:2]).astype(jnp.int32)
        t_ids = jnp.full_like(a_ids, t)
        emb = self.encoder.embed_rtg_tokens(rtg_bins, t_ids, a_ids, existence[..., None])
        emb = self.encoder.embed_ln(emb)
        k = 0 if self.cfg.model.decision_transformer else 1
        return self.decoder.decode_step_groups(
            [(emb, k, t)], cache, memory, memory_valid, window,
            memory_kv=memory_kv, mask_override=mask_override,
        )

    def stream_action(
        self,
        actions: Array,  # [B, A] discrete ids
        existence: Array,
        t: Array,
        cache,
        memory: Array,
        memory_valid: Array,
        window: int,
        memory_kv: tuple | None = None,
    ):
        """Append this step's action tokens (populates the cache for future
        steps; outputs feed the future-state head if needed)."""
        A = actions.shape[1]
        a_ids = jnp.broadcast_to(jnp.arange(A)[None, :], actions.shape[:2]).astype(jnp.int32)
        t_ids = jnp.full_like(a_ids, t)
        emb = self.encoder.embed_action_tokens(actions, t_ids, a_ids, existence[..., None])
        emb = self.encoder.embed_ln(emb)
        k = self.cfg.model.num_token_types - 1
        return self.decoder.decode_step(
            emb, k, t, cache, memory, memory_valid, window, memory_kv=memory_kv
        )

    def rtg_head(self, x: Array) -> Array:
        return self.decoder.predict_rtg(x)

    def action_head(self, x: Array) -> Array:
        return self.decoder.predict_action(x)


class LossDict(NamedTuple):
    total: Array
    loss_actions: Array
    loss_rtg_goal: Array
    loss_rtg_veh: Array
    loss_rtg_road: Array
    loss_state: Array


def _masked_ce(logits: Array, targets: Array, mask: Array) -> Array:
    """Cross entropy, masked mean (reference uses F.cross_entropy with
    reduction='none' then mask-sum / mask-sum)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[
        ..., 0
    ]
    mask = mask.astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _shifted_futures(x: Array, T: int) -> tuple[Array, Array]:
    """states_new[..., i, j] = x[..., i+1+j] for i+1+j < T else 0, plus the
    validity mask of that triangular layout (ctrl_sim.py:127-138)."""
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    src = i + 1 + j  # [T, T]
    in_range = src < T
    src = jnp.minimum(src, T - 1)
    gathered = jnp.take(x, src.reshape(-1), axis=2)  # [B, A, T*T, ...]
    gathered = gathered.reshape(x.shape[:2] + (T, T) + x.shape[3:])
    m = in_range.astype(x.dtype)
    m = m.reshape((1, 1, T, T) + (1,) * (x.ndim - 3))
    return gathered * m, in_range


def compute_loss(cfg: Config, batch: dict, preds: DecoderOutput) -> LossDict:
    mc = cfg.model
    wc = cfg.waymo
    agent_states = batch["agent_states"]  # [B, A, T, 8]
    B, A, T, _ = agent_states.shape
    existence = agent_states[..., -1]  # [B, A, T]
    moving = batch["moving_agent_mask"]  # [B, A]
    zero = jnp.asarray(0.0, jnp.float32)

    # ----- action CE (ctrl_sim.py:50-86) -------------------------------
    if mc.trajeglish:
        logits = preds.action_preds[:, :, :-1, :]
        targets = batch["actions"][:, :, 1:]
        mask = agent_states[:, :, 1:, -1]
        if mc.supervise_moving:
            mask = mask * moving[:, :, None]
        loss_actions = mc.loss_action_coef * _masked_ce(logits, targets, mask)
        existence_mask = mask
    else:
        mask = existence
        if mc.supervise_moving:
            mask = mask * moving[:, :, None]
        loss_actions = mc.loss_action_coef * _masked_ce(
            preds.action_preds, batch["actions"], mask
        )
        existence_mask = mask

    # ----- RTG CE (ctrl_sim.py:88-111): masked by the same (moving x
    # existence) mask the action loss used -------------------------------
    loss_rtg_goal = loss_rtg_veh = loss_rtg_road = zero
    if mc.predict_rtg and preds.rtg_preds is not None:
        # [B, A, T, 350*3] -> [B, A, T, 350, 3] (bins-major, see decoder head)
        rp = preds.rtg_preds.reshape(B, A, T, wc.rtg_discretization, 3)
        rtgs = batch["rtgs"]
        loss_rtg_goal = _masked_ce(rp[..., 0], rtgs[..., 0], existence_mask)
        loss_rtg_veh = _masked_ce(rp[..., 1], rtgs[..., 1], existence_mask)
        loss_rtg_road = _masked_ce(rp[..., 2], rtgs[..., 2], existence_mask)

    # ----- auxiliary future-state MSE (ctrl_sim.py:114-187) -------------
    loss_state = zero
    if mc.predict_future_states and preds.state_preds is not None:
        ex = existence
        if mc.supervise_moving:
            ex = ex * moving[:, :, None]
        states_xy = agent_states[..., :2]
        if mc.local_frame_predictions:
            # rotate future displacements into each agent's frame at time i
            # by -yaw_i (ctrl_sim.py:165-178)
            fut5, in_range = _shifted_futures(agent_states[..., :5], T)
            origin = agent_states[..., :5][:, :, :, None, :]  # [B, A, T, 1, 5]
            translated = fut5[..., :2] - origin[..., :2]
            yaw = agent_states[..., 4][:, :, :, None]  # [B, A, T, 1]
            c, s = jnp.cos(yaw), jnp.sin(yaw)
            x = c * translated[..., 0] + s * translated[..., 1]
            y = -s * translated[..., 0] + c * translated[..., 1]
            fut = jnp.stack([x, y], axis=-1)
        else:
            fut, in_range = _shifted_futures(states_xy, T)  # [B, A, T, T, 2]
        ex_fut, _ = _shifted_futures(ex[..., None], T)  # [B, A, T, T, 1]
        ex_fut = ex_fut[..., 0] * in_range[None, None]
        sp = preds.state_preds.reshape(B, A, T, T, 2).astype(jnp.float32)
        err = jnp.sum((sp - fut.astype(jnp.float32)) ** 2, axis=-1)
        loss_state = jnp.sum(err * ex_fut) / (
            100.0 * jnp.maximum(jnp.sum(ex_fut) * 2.0, 1.0)
        )

    total = loss_actions
    if mc.predict_rtg:
        total = total + loss_rtg_goal + loss_rtg_veh + loss_rtg_road
    if mc.predict_future_states:
        total = total + loss_state
    return LossDict(
        total=total,
        loss_actions=loss_actions,
        loss_rtg_goal=loss_rtg_goal,
        loss_rtg_veh=loss_rtg_veh,
        loss_rtg_road=loss_rtg_road,
        loss_state=loss_state,
    )
