"""Flash-attention kernel parity: blockwise in-kernel multi-agent causal
mask vs the dense-mask reference path, forward and gradients, on CPU via
Pallas interpret mode.

Covers the kernel in isolation (all token layouts, strict mode, windowing,
padded final blocks, dropout determinism + finite differences) and the full
CtRL-Sim model end-to-end (flash decoder == dense decoder, loss gradients
match)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import load_config
from ctrl_sim_tpu.data import stack_scenarios, synthetic_scenario
from ctrl_sim_tpu.data.datagen import generate_offline_data
from ctrl_sim_tpu.data.pipeline import build_train_batch
from ctrl_sim_tpu.data.scenario import Scenario
from ctrl_sim_tpu.models.ctrl_sim import CtRLSim, compute_loss
from ctrl_sim_tpu.ops import masks
from ctrl_sim_tpu.ops.flash_attention import MaskSpec, flash_mha

SMALL = {
    "model.hidden_dim": 32,
    "model.dim_feedforward": 64,
    "model.num_heads": 2,
    "model.num_decoder_layers": 2,
    "model.num_transformer_encoder_layers": 1,
    "model.compute_dtype": "float32",
    "waymo.train_context_length": 8,
    "waymo.max_num_agents": 6,
    "waymo.max_num_road_polylines": 16,
    "waymo.max_num_road_pts_per_polyline": 20,
    "sim.steps": 20,
}


def dense_reference(q, k, v, mask, num_heads):
    B, T, D = q.shape
    hd = D // num_heads
    q4 = q.reshape(B, T, num_heads, hd)
    k4 = k.reshape(B, T, num_heads, hd)
    v4 = v.reshape(B, T, num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q4, k4) / np.sqrt(hd)
    s = jnp.where(mask[None, None], s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v4).reshape(B, T, D)


@pytest.mark.parametrize(
    "A,K,steps,nh,hd,strict,window,bq",
    [
        (3, 3, 4, 2, 4, False, None, 8),  # CtRL-Sim layout
        (3, 3, 4, 2, 4, True, 2, 8),  # strict + sliding window
        (2, 2, 5, 4, 8, False, None, 16),  # IL-style 2-token layout
        (4, 1, 6, 2, 4, False, 3, 8),  # trajeglish action-only
        (3, 3, 4, 2, 4, False, None, 7),  # bq doesn't divide T: padded block
    ],
)
def test_kernel_matches_dense(A, K, steps, nh, hd, strict, window, bq):
    T = steps * A * K
    D = nh * hd
    spec = MaskSpec(A, K, 0, strict, window)
    mask = masks.multi_agent_causal_mask(steps, A, K, 0, strict, window)
    rng = np.random.RandomState(0)
    q, k, v, ct = (jnp.asarray(rng.randn(2, T, D), jnp.float32) for _ in range(4))

    out = flash_mha(q, k, v, spec, nh, block_q=bq, interpret=True)
    ref = dense_reference(q, k, v, mask, nh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    f1 = lambda q, k, v: jnp.sum(flash_mha(q, k, v, spec, nh, block_q=bq, interpret=True) * ct)
    f2 = lambda q, k, v: jnp.sum(dense_reference(q, k, v, mask, nh) * ct)
    g1 = jax.grad(f1, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


class TestDropout:
    A, K, steps, nh = 3, 3, 3, 2
    T = steps * A * K
    D = nh * 4
    spec = MaskSpec(A, K, 0, False, None)

    def _data(self):
        rng = np.random.RandomState(1)
        return tuple(
            jnp.asarray(rng.randn(2, self.T, self.D), jnp.float32) for _ in range(4)
        )

    def test_deterministic_per_seed(self):
        q, k, v, _ = self._data()
        s = jnp.array([1234], jnp.uint32)
        o1 = flash_mha(q, k, v, self.spec, self.nh, dropout_p=0.3, seed=s, block_q=8, interpret=True)
        o2 = flash_mha(q, k, v, self.spec, self.nh, dropout_p=0.3, seed=s, block_q=8, interpret=True)
        o3 = flash_mha(
            q, k, v, self.spec, self.nh, dropout_p=0.3,
            seed=jnp.array([99], jnp.uint32), block_q=8, interpret=True,
        )
        assert bool(jnp.all(o1 == o2))
        assert bool(jnp.any(o1 != o3))

    def test_block_size_invariant(self):
        # the hash is keyed on global (row, col): any blocking gives the
        # same keep mask, which is what lets bwd regenerate fwd's bits
        q, k, v, _ = self._data()
        s = jnp.array([7], jnp.uint32)
        o1 = flash_mha(q, k, v, self.spec, self.nh, dropout_p=0.25, seed=s, block_q=9, interpret=True)
        o2 = flash_mha(q, k, v, self.spec, self.nh, dropout_p=0.25, seed=s, block_q=27, interpret=True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)

    def test_grad_finite_difference(self):
        # the keep mask depends only on the seed, so central differences
        # are exact modulo O(eps^2) even with dropout on
        q, k, v, ct = self._data()
        s = jnp.array([42], jnp.uint32)

        def f(q):
            return jnp.sum(
                flash_mha(q, k, v, self.spec, self.nh, dropout_p=0.3, seed=s, block_q=9, interpret=True)
                * ct
            )

        g = jax.grad(f)(q)
        eps = 1e-3
        for idx in [(0, 0, 0), (1, 10, 3), (0, self.T - 1, self.D - 1)]:
            fd = (f(q.at[idx].add(eps)) - f(q.at[idx].add(-eps))) / (2 * eps)
            np.testing.assert_allclose(float(g[idx]), float(fd), atol=3e-3)

    def test_zero_dropout_matches_dense(self):
        q, k, v, _ = self._data()
        mask = masks.multi_agent_causal_mask(self.steps, self.A, self.K, 0, False, None)
        o = flash_mha(q, k, v, self.spec, self.nh, dropout_p=0.0, block_q=9, interpret=True)
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(dense_reference(q, k, v, mask, self.nh)), atol=2e-5
        )


# ---------------------------------------------------------------------------
# end-to-end: flash decoder == dense decoder on the full model
# ---------------------------------------------------------------------------


def _to_device(s):
    return Scenario(
        **{
            k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
            for k, v in dataclasses.asdict(s).items()
        }
    )


@pytest.fixture(scope="module")
def cfg_and_batch():
    cfg = load_config(SMALL)
    scenes = [
        synthetic_scenario(cfg, seed=s, num_agents=4, arena_half=80.0, num_lanes=2)
        for s in range(2)
    ]
    batch_sc = _to_device(stack_scenarios(scenes, cfg))
    offline = generate_offline_data(cfg, batch_sc)
    batch = build_train_batch(cfg, jax.random.PRNGKey(0), batch_sc, offline)
    return cfg, batch


@pytest.mark.slow  # full-model compile ~135 s
def test_model_flash_matches_dense(cfg_and_batch):
    cfg, batch = cfg_and_batch
    dense_cfg = load_config({**SMALL, "model.use_flash_attention": False})
    flash_cfg = load_config(
        {**SMALL, "model.use_flash_attention": True, "model.flash_interpret": True,
         "model.flash_block_q": 16}
    )
    model_d = CtRLSim(dense_cfg)
    model_f = CtRLSim(flash_cfg)
    params = model_d.init({"params": jax.random.PRNGKey(0)}, batch)

    out_d = model_d.apply(params, batch)
    out_f = model_f.apply(params, batch)
    np.testing.assert_allclose(
        np.asarray(out_f.action_preds), np.asarray(out_d.action_preds), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_f.rtg_preds), np.asarray(out_d.rtg_preds), atol=2e-4
    )

    def loss_fn(model, cfg):
        def inner(p):
            preds = model.apply(p, batch)
            return compute_loss(cfg, batch, preds).total

        return inner

    g_d = jax.grad(loss_fn(model_d, dense_cfg))(params)
    g_f = jax.grad(loss_fn(model_f, flash_cfg))(params)
    flat_d = jax.tree_util.tree_leaves(g_d)
    flat_f = jax.tree_util.tree_leaves(g_f)
    for a, b in zip(flat_f, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_model_flash_dropout_trains(cfg_and_batch):
    """The training path (deterministic=False, dropout rng) runs through the
    flash kernel's in-kernel dropout without error and yields finite grads."""
    cfg, batch = cfg_and_batch
    flash_cfg = load_config(
        {**SMALL, "model.use_flash_attention": True, "model.flash_interpret": True,
         "model.flash_block_q": 16}
    )
    model = CtRLSim(flash_cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)

    def loss(p):
        preds = model.apply(
            p, batch, deterministic=False, rngs={"dropout": jax.random.PRNGKey(3)}
        )
        return compute_loss(flash_cfg, batch, preds).total

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
