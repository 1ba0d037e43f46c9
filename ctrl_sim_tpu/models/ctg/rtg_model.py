"""RTG prediction head for CTG++ conditioning (reference: modules/rtg_model.py).

Same AutoBots trunk as the denoiser (temporal / social / map attention over
the past horizon only), predicting 350 x 3 RTG logits per agent from the
present-step embedding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.models.ctg.dit import (
    DiTTrunk,
    MapEncoderPtsMA,
    SingleInputEmbedding,
)
from ctrl_sim_tpu.models.layers import Embed, MLPLayer, _dense

Array = jax.Array


class RTGModel(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, cond: dict, deterministic: bool = True) -> Array:
        mc = self.cfg.model
        wc = self.cfg.waymo
        H = mc.hidden_dim
        dtype = jnp.dtype(mc.compute_dtype)

        past_states = cond["agent_past_states"]  # [B, N, T_in, 8]
        past_actions = cond["agent_past_actions"]
        B, N, T_in, _ = past_states.shape

        types = jnp.broadcast_to(
            cond["agent_types"][:, :, None, :], (B, N, T_in, wc.num_agent_types)
        )
        past_sa = jnp.concatenate([past_states[..., :-1], past_actions], axis=-1)
        seq = jnp.concatenate([past_sa, types.astype(past_sa.dtype)], axis=-1)
        exist = past_states[..., -1] > 0

        state_act_emb = MLPLayer(H, H, dtype=dtype, name="embed_state_action")(
            seq.astype(dtype)
        )
        goal_emb = MLPLayer(H, H, dtype=dtype, name="embed_goal")(
            cond["goals"].astype(dtype)
        )[:, :, None, :]
        if not deterministic and mc.goal_dropout > 0.0:
            keep = (
                jax.random.uniform(self.make_rng("dropout"), (B, N, 1, 1))
                > mc.goal_dropout
            )
            goal_emb = goal_emb * keep.astype(dtype)
        goal_emb = jnp.broadcast_to(goal_emb, state_act_emb.shape)

        t_emb = Embed(wc.max_timestep, H, dtype, name="embed_timestep")(
            cond["timesteps"][:, :T_in].astype(jnp.int32)
        )[:, None, :, :]
        t_emb = jnp.broadcast_to(t_emb, state_act_emb.shape)

        fused = MLPLayer(H, H, dtype=dtype, name="embed_all_elements")(
            jnp.concatenate([state_act_emb, goal_emb], axis=-1)
        )
        agent_emb = fused + t_emb

        edge_emb = SingleInputEmbedding(H, dtype, name="relative_encodings_encoder")(
            cond["past_relative_encodings"].astype(dtype)
        )
        edge_emb = jnp.transpose(edge_emb, (0, 3, 1, 2, 4))

        map_features, map_valid = MapEncoderPtsMA(self.cfg, name="map_encoder")(
            cond["road_points"], cond["road_types"], deterministic
        )

        out = DiTTrunk(self.cfg, inject_diffusion_step=False, name="trunk")(
            agent_emb, exist, edge_emb, map_features, map_valid, None, deterministic
        )
        present = out[:, :, -1]  # [B, N, H]
        return MLPLayer(
            H,
            wc.rtg_discretization * mc.num_reward_components,
            dtype=dtype,
            name="predict_rtg",
        )(present)


def rtg_model_loss(cfg: Config, cond: dict, logits: Array) -> tuple[Array, Array, Array]:
    """Masked CE on the 3 components (rtg_model.py:168-194)."""
    wc = cfg.waymo
    existence = cond["agent_past_states"][..., -1, -1]  # [B, N]
    rp = logits.reshape(
        logits.shape[0], logits.shape[1], wc.rtg_discretization, 3
    ).astype(jnp.float32)
    targets = cond["rtgs"][:, :, -1].astype(jnp.int32)  # [B, N, 3]

    def ce(component):
        logp = jax.nn.log_softmax(rp[..., component], axis=-1)
        nll = -jnp.take_along_axis(
            logp, targets[..., component : component + 1], axis=-1
        )[..., 0]
        mask = existence.astype(jnp.float32)
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    return ce(0), ce(1), ce(2)
