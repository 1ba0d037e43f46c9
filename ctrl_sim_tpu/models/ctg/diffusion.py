"""Gaussian diffusion for CTG++ (reference: modules/diffusion.py +
utils/diffusion_helpers.py).

DDPM with a cosine beta schedule, 100 train steps, x0-prediction
(predict_epsilon=False), weighted L2 with the first future action up-weighted
x10, diffusing joint [local_state(5) || action(2)] futures, and a strided
50-step eval sampling loop under ``lax.scan`` (the reference's Python loop,
modules/diffusion.py:154-186).

Guidance: the reference imports a ``modules.diffusion_guidance`` module that
does not exist in its tree (its guidance call-sites are commented out) — a
shipped-broken dependency we do NOT replicate. Instead ``p_sample_loop``
accepts an optional ``guidance_fn(x, cond) -> scalar cost`` whose gradient
nudges the denoised mean (classifier-guidance style), default off. This
makes the CTG/CTG++ guidance interface real while keeping the default path
exactly the reference's unguided sampler.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.models.ctg.dit import DiT

Array = jax.Array


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """diffusion_helpers.py:80-91."""
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999).astype(np.float32)


class DiffusionSchedule(NamedTuple):
    betas: Array
    alphas_cumprod: Array
    alphas_cumprod_prev: Array
    sqrt_alphas_cumprod: Array
    sqrt_one_minus_alphas_cumprod: Array
    sqrt_recip_alphas_cumprod: Array
    sqrt_recipm1_alphas_cumprod: Array
    posterior_variance: Array
    posterior_log_variance_clipped: Array
    posterior_mean_coef1: Array
    posterior_mean_coef2: Array

    @staticmethod
    def create(n_timesteps: int) -> "DiffusionSchedule":
        betas = cosine_beta_schedule(n_timesteps)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.concatenate([[1.0], ac[:-1]])
        post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
        return DiffusionSchedule(
            betas=jnp.asarray(betas),
            alphas_cumprod=jnp.asarray(ac),
            alphas_cumprod_prev=jnp.asarray(ac_prev),
            sqrt_alphas_cumprod=jnp.asarray(np.sqrt(ac)),
            sqrt_one_minus_alphas_cumprod=jnp.asarray(np.sqrt(1.0 - ac)),
            sqrt_recip_alphas_cumprod=jnp.asarray(np.sqrt(1.0 / ac)),
            sqrt_recipm1_alphas_cumprod=jnp.asarray(np.sqrt(1.0 / ac - 1.0)),
            posterior_variance=jnp.asarray(post_var),
            posterior_log_variance_clipped=jnp.asarray(
                np.log(np.clip(post_var, 1e-20, None))
            ),
            posterior_mean_coef1=jnp.asarray(
                betas * np.sqrt(ac_prev) / (1.0 - ac)
            ),
            posterior_mean_coef2=jnp.asarray(
                (1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac)
            ),
        )


def _extract(a: Array, t: Array, ndim: int) -> Array:
    out = jnp.take(a, t)
    return out.reshape(t.shape + (1,) * (ndim - t.ndim))


class GaussianDiffusion(nn.Module):
    """Owns the DiT denoiser; provides training loss + sampling."""

    cfg: Config

    def setup(self):
        wc = self.cfg.waymo
        mc = self.cfg.model
        self.model = DiT(self.cfg)
        self.horizon = wc.train_context_length - wc.input_horizon
        self.action_dim = wc.ctg_action_dim
        self.transition_dim = (wc.k_attr - 2) + self.action_dim
        self.n_timesteps = mc.n_diffusion_steps
        self.schedule = DiffusionSchedule.create(self.n_timesteps)
        self.loss_weights = self._loss_weights()

    def _loss_weights(self) -> Array:
        """get_loss_weights (diffusion.py:82-110): uniform dim weights with
        discount**t over the horizon (normalized), a0 action weight = 10."""
        mc = self.cfg.model
        dim_weights = np.ones(self.transition_dim, np.float32)
        discounts = mc.loss_discount ** np.arange(self.horizon, dtype=np.float32)
        discounts = discounts / discounts.mean()
        w = np.einsum("h,t->ht", discounts, dim_weights)[None]
        w[:, 0, -self.action_dim :] = mc.action_weight
        return jnp.asarray(w)  # [1, horizon, transition_dim]

    # ------------------------------------------------------------------
    def q_sample(self, x_start: Array, t: Array, noise: Array) -> Array:
        s = self.schedule
        return (
            _extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def denoise(
        self, x: Array, cond: dict, t: Array, deterministic: bool = True
    ) -> Array:
        """Model output — x0 prediction (predict_epsilon=False)."""
        return self.model(x, cond, t, deterministic)

    # ------------------------------------------------------------------
    def loss(self, cond: dict, x_states: Array, x_actions: Array, rng: Array):
        """p_losses (diffusion.py:256-285): weighted L2 on x0 prediction,
        masked by existence (x moving mask when supervise_moving).

        x_states: [B, N, T_out, 6] (local state 5 + existence),
        x_actions: [B, N, T_out, 2].
        """
        mc = self.cfg.model
        x = jnp.concatenate([x_states[..., :-1], x_actions], axis=-1)
        existence = x_states[..., -1]
        if mc.supervise_moving:
            existence = existence * cond["moving_agent_mask"][..., None]
        B = x.shape[0]
        k_t, k_noise = jax.random.split(rng)
        t = jax.random.randint(k_t, (B,), 0, self.n_timesteps)
        noise = jax.random.normal(k_noise, x.shape)
        # per-batch-element t broadcast across agents/time (torch `extract`)
        x_noisy = self.q_sample(x, t, noise)
        x_recon = self.denoise(x_noisy, cond, t, deterministic=False)
        target = x  # predict_epsilon = False

        # WeightedLoss (diffusion_helpers.py:101-117)
        w = self.loss_weights[None]  # [1, 1, horizon, transition]
        err = (x_recon.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        weighted = (err * w * existence[..., None]).mean(-1)
        denom = jnp.maximum(existence.sum(axis=(1, 2)), 1.0)
        weighted_loss = (weighted.sum(axis=(1, 2)) / denom).mean()
        a0 = (
            err[:, :, 0, -self.action_dim :]
            * existence[:, :, :1]
            / w[:, :, 0, -self.action_dim :]
        ).mean()
        return weighted_loss, {"a0_loss": a0}

    # ------------------------------------------------------------------
    def sample(
        self,
        cond: dict,
        rng: Array,
        guidance_fn: Callable[[Array, dict], Array] | None = None,
        guide_scale: float = 0.1,
        n_guide_steps: int = 2,
        noise_override: tuple[Array, Array] | None = None,
    ) -> Array:
        """Strided p_sample_loop (diffusion.py:154-186): x starts at
        0.5*N(0, I); n_eval steps strided over the train steps; noise scale
        0.5; posterior step from the x0 prediction.

        ``noise_override = (x0_noise, step_noises[n_eval])`` substitutes an
        explicit unit-normal noise stream for the jax RNG draws — used by
        tests/test_ctg_golden.py to replay the executed torch reference's
        recorded stream and compare final samples exactly."""
        mc = self.cfg.model
        s = self.schedule
        past = cond["agent_past_states"]
        B, N = past.shape[:2]
        shape = (B, N, self.horizon, self.transition_dim)
        rng, k0 = jax.random.split(rng)
        if noise_override is not None:
            x = 0.5 * noise_override[0]
        else:
            x = 0.5 * jax.random.normal(k0, shape)

        stride = self.n_timesteps // mc.n_eval_diffusion_step
        ts = jnp.arange(0, self.n_timesteps, stride)[::-1]

        if self.is_initializing():
            # flax cannot create params inside a lax.scan body (they would
            # leak out of the scan trace): initialize the denoiser with one
            # unrolled call instead of the sampling loop
            self.denoise(x, cond, jnp.zeros((B,), jnp.int32))
            return x

        def body(carry, scan_in):
            x, rng = carry
            if noise_override is not None:
                i, step_noise = scan_in
            else:
                i = scan_in
            rng, k = jax.random.split(rng)
            t = jnp.full((B,), i, jnp.int32)
            x_recon = self.denoise(x, cond, t)
            mean = (
                _extract(s.posterior_mean_coef1, t, x.ndim) * x_recon
                + _extract(s.posterior_mean_coef2, t, x.ndim) * x
            )
            if guidance_fn is not None:
                for _ in range(n_guide_steps):
                    g = jax.grad(lambda xx: guidance_fn(xx, cond))(mean)
                    mean = mean - guide_scale * g
            log_var = _extract(s.posterior_log_variance_clipped, t, x.ndim)
            if noise_override is not None:
                noise = 0.5 * step_noise
            else:
                noise = 0.5 * jax.random.normal(k, x.shape)
            nonzero = (i != 0).astype(x.dtype)
            x = mean + nonzero * jnp.exp(0.5 * log_var) * noise
            return (x, rng), None

        xs = (ts, noise_override[1]) if noise_override is not None else ts
        (x, _), _ = jax.lax.scan(body, (x, rng), xs)
        return x

    def __call__(self, cond: dict, rng: Array) -> Array:
        return self.sample(cond, rng)
