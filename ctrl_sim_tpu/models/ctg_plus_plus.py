"""CTG++ model wrapper: diffusion training loss + validation sampling MSE
(reference: models/ctg_plus_plus.py).

Training: weighted-L2 diffusion loss over joint [state(5) || action(2)]
futures. Validation computes action/state MSE of sampled futures vs ground
truth (models/ctg_plus_plus.py:79-107). An optional RTGModel head trains
alongside for closed-loop RTG conditioning.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.models.ctg.diffusion import GaussianDiffusion
from ctrl_sim_tpu.models.ctg.rtg_model import RTGModel, rtg_model_loss

Array = jax.Array

COND_KEYS = (
    "agent_past_states",
    "agent_past_actions",
    "past_relative_encodings",
    "future_relative_encodings",
    "agent_types",
    "goals",
    "timesteps",
    "rtgs",
    "road_points",
    "road_types",
    "moving_agent_mask",
)


class CTGLossDict(NamedTuple):
    total: Array
    diffusion_loss: Array
    a0_loss: Array
    rtg_goal: Array
    rtg_veh: Array
    rtg_road: Array


class CTGPlusPlus(nn.Module):
    cfg: Config

    def setup(self):
        self.diffusion = GaussianDiffusion(self.cfg)
        if self.cfg.model.use_rtg:
            self.rtg_model = RTGModel(self.cfg)

    def __call__(self, batch: dict, rng: Array) -> Array:
        """Sample futures [B, N, T_out, 7]."""
        cond = {k: batch[k] for k in COND_KEYS}
        return self.diffusion.sample(cond, rng)

    def sample_from_cond(
        self, cond: dict, rng: Array, guidance_fn=None
    ) -> Array:
        """Sample futures from an already-built conditioning dict (rollout);
        optional classifier-guidance cost (models/ctg/guidance.py)."""
        return self.diffusion.sample(cond, rng, guidance_fn=guidance_fn)

    def loss(self, batch: dict, rng: Array) -> CTGLossDict:
        cond = {k: batch[k] for k in COND_KEYS}
        dloss, info = self.diffusion.loss(
            cond, batch["agent_future_states"], batch["agent_future_actions"], rng
        )
        zero = jnp.asarray(0.0, jnp.float32)
        rtg_g = rtg_v = rtg_r = zero
        if self.cfg.model.use_rtg:
            logits = self.rtg_model(cond, deterministic=False)
            rtg_g, rtg_v, rtg_r = rtg_model_loss(self.cfg, cond, logits)
        total = dloss + rtg_g + rtg_v + rtg_r
        return CTGLossDict(
            total=total,
            diffusion_loss=dloss,
            a0_loss=info["a0_loss"],
            rtg_goal=rtg_g,
            rtg_veh=rtg_v,
            rtg_road=rtg_r,
        )

    def validation_mse(self, batch: dict, rng: Array) -> dict:
        """Sampled-future action/state MSE (models/ctg_plus_plus.py:79-107)."""
        samples = self(batch, rng)
        tgt_k = self.cfg.waymo.k_attr - 2
        gt_states = batch["agent_future_states"][..., :tgt_k]
        gt_actions = batch["agent_future_actions"]
        exist = batch["agent_future_states"][..., -1:]
        denom = jnp.maximum(exist.sum(), 1.0)
        state_mse = (
            ((samples[..., :tgt_k] - gt_states) ** 2) * exist
        ).sum() / (denom * tgt_k)
        action_mse = (
            ((samples[..., tgt_k:] - gt_actions) ** 2) * exist
        ).sum() / (denom * 2)
        return {"state_mse": state_mse, "action_mse": action_mse}
