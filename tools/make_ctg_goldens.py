"""Executed-reference goldens for the FULL CTG++ stack.

Round 3 pinned only the DiT *social layer* to the executed reference
(make_dit_goldens.py). This tool executes the rest, exactly as the CtRL-Sim
families were treated:

- the full DiT denoiser forward (/root/reference/modules/ctg_arch.py:338-511),
  once with use_rtg=True (superset of embeddings) — weights, inputs, output;
- RTGModel forward (/root/reference/modules/rtg_model.py:24-166);
- the strided diffusion p_sample_loop
  (/root/reference/modules/diffusion.py:145-186) at the default
  use_rtg=False config, with torch.randn/randn_like monkeypatched to a
  recorded numpy stream so the JAX sampler can consume the *same* noise and
  the final denoised samples can be compared exactly.

The reference's ``modules.diffusion_guidance`` import is shipped broken
(the module does not exist in its tree); it is stubbed here, which is also
what documents that fact.

Run (CPU, repo root):
    PYTHONPATH=. JAX_PLATFORMS=cpu python tools/make_ctg_goldens.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                   "reference_ctg.npz")

# small-but-structured shapes (mirrors make_model_goldens.py conventions)
B, N = 2, 4
T_IN, T_OUT = 3, 3
T = T_IN + T_OUT
HID, HEADS, FFN = 32, 2, 64
S, P = 5, 6  # road segments per agent, points per segment
RTG_DISC = 20
N_DIFF, N_EVAL = 20, 10
L_ENC = 2
K_ATTR = 7
TGT_K = K_ATTR - 2


def _cfg(use_rtg: bool):
    model = types.SimpleNamespace(
        hidden_dim=HID, num_heads=HEADS, dim_feedforward=FFN, dropout=0.1,
        goal_dropout=0.1, num_transformer_encoder_layers=L_ENC,
        diffusion_type="states_actions", n_diffusion_steps=N_DIFF,
        n_eval_diffusion_step=N_EVAL, predict_epsilon=False,
        returns_condition=True, condition_guidance_w=1.2,
        action_weight=10.0, loss_discount=1.0, use_rtg=use_rtg,
        num_reward_components=3, supervise_moving=False,
    )
    waymo = types.SimpleNamespace(
        k_attr=K_ATTR, map_attr=3, action_dim=2, goal_dim=5,
        num_reward_components=3, num_road_types=8, max_num_agents=N,
        num_agent_types=5, rtg_discretization=RTG_DISC, max_timestep=90,
        train_context_length=T, input_horizon=T_IN,
    )
    train = types.SimpleNamespace(loss_type="l2")
    return types.SimpleNamespace(
        model=model, train=train, dataset=types.SimpleNamespace(waymo=waymo)
    )


def _make_cond(rng: np.random.Generator):
    """The reference cond tuple (ctg_arch.py:460-461), numpy-side."""
    past_states = rng.normal(size=(B, N, T_IN, K_ATTR + 1)).astype(np.float32)
    exist = (rng.uniform(size=(B, N, T_IN)) > 0.2).astype(np.float32)
    exist[:, 0] = 1.0  # keep one agent fully alive
    past_states[..., -1] = exist
    past_actions = rng.normal(size=(B, N, T_IN, 2)).astype(np.float32)
    past_rel = rng.normal(size=(B, N, N, T_IN, 7)).astype(np.float32)
    future_rel = rng.normal(size=(B, N, N, T_OUT, 7)).astype(np.float32)
    agent_types = np.eye(5, dtype=np.float32)[rng.integers(0, 5, (B, N))]
    goals = rng.normal(size=(B, N, 5)).astype(np.float32)
    # dataset_ctg_plus_plus.py:331-333: every entry holds the constant
    # present step — shape [B, N, T, 1]
    present = 7
    timesteps = np.full((B, N, T, 1), present, np.int64)
    rtgs = rng.integers(0, RTG_DISC, (B, N, T_IN, 3)).astype(np.int64)
    road_points = rng.normal(size=(B, N, S, P, 3)).astype(np.float32)
    road_points[..., -1] = (rng.uniform(size=(B, N, S, P)) > 0.3).astype(
        np.float32
    )
    road_points[:, :, -1, :, -1] = 0.0  # one fully-invalid segment per agent
    road_points[:, 1, :, :, -1] = 0.0  # one agent with no road at all
    road_types = np.eye(8, dtype=np.float32)[rng.integers(0, 8, (B, N, S))]
    moving = (rng.uniform(size=(B, N)) > 0.3).astype(np.float32)
    translation_yaws = np.zeros((B, N, 3), np.float32)
    return dict(
        agent_past_states=past_states,
        agent_past_actions=past_actions,
        agent_past_rel_encodings=past_rel,
        agent_future_rel_encodings=future_rel,
        agent_types=agent_types,
        goals=goals,
        timesteps=timesteps,
        rtgs=rtgs,
        road_points=road_points,
        road_types=road_types,
        moving_agent_masks=moving,
        translation_yaws=translation_yaws,
    )


def _cond_tuple(torch, c, with_translation=True):
    keys = [
        "agent_past_states", "agent_past_actions", "agent_past_rel_encodings",
        "agent_future_rel_encodings", "agent_types", "goals", "timesteps",
        "rtgs", "road_points", "road_types", "moving_agent_masks",
    ]
    if with_translation:
        keys.append("translation_yaws")
    return tuple(torch.from_numpy(c[k]) for k in keys)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_dit_goldens import _install_stubs

    _install_stubs()
    # modules/diffusion.py line 14 imports modules.diffusion_guidance, which
    # does not exist in the reference tree (shipped broken); stub it
    guidance_stub = types.ModuleType("modules.diffusion_guidance")
    guidance_stub.n_step_guided_p_sample = lambda *a, **k: None
    guidance_stub.GoalGuide = object
    guidance_stub.CollisionGuide = object
    sys.modules["modules.diffusion_guidance"] = guidance_stub

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    import torch

    ctg_arch = importlib.import_module("modules.ctg_arch")
    rtg_mod = importlib.import_module("modules.rtg_model")
    diff_mod = importlib.import_module("modules.diffusion")

    out: dict[str, np.ndarray] = {}
    rng = np.random.default_rng(23)
    cond_np = _make_cond(rng)
    for k, v in cond_np.items():
        out[f"in_{k}"] = v

    # ---- 1. full DiT forward, use_rtg=True (superset of embed paths) -----
    torch.manual_seed(3)
    dit = ctg_arch.DiT(_cfg(use_rtg=True)).eval()
    future_k = rng.normal(size=(B, N, T_OUT, TGT_K + 2)).astype(np.float32)
    diff_step = np.asarray([3, 11], np.int64)
    out["in_future_k"] = future_k
    out["in_diff_step"] = diff_step
    with torch.no_grad():
        y = dit(
            torch.from_numpy(future_k), _cond_tuple(torch, cond_np),
            torch.from_numpy(diff_step), eval=True,
        )
    out["dit_out"] = y.numpy()
    for name, p in dit.named_parameters():
        out["dit_w_" + name] = p.detach().numpy()

    # ---- 2. RTGModel forward -------------------------------------------
    torch.manual_seed(5)
    rtgm = rtg_mod.RTGModel(_cfg(use_rtg=False)).eval()
    with torch.no_grad():
        ry = rtgm(_cond_tuple(torch, cond_np, with_translation=False),
                  eval=True)
    out["rtg_out"] = ry.numpy()
    for name, p in rtgm.named_parameters():
        out["rtg_w_" + name] = p.detach().numpy()

    # ---- 3. diffusion p_sample_loop at the shipped default (use_rtg off),
    # with the noise stream recorded --------------------------------------
    torch.manual_seed(9)
    gd = diff_mod.GaussianDiffusion(_cfg(use_rtg=False)).eval()
    noises: list[np.ndarray] = []
    nrng = np.random.default_rng(31)

    def fake_randn(*shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (tuple, torch.Size, list)):
            shape = tuple(shape[0])
        arr = nrng.normal(size=shape).astype(np.float32)
        noises.append(arr)
        return torch.from_numpy(arr)

    orig_randn, orig_like = torch.randn, torch.randn_like
    torch.randn = fake_randn
    torch.randn_like = lambda x: fake_randn(*tuple(x.shape))
    try:
        with torch.no_grad():
            xs = gd.conditional_sample(_cond_tuple(torch, cond_np))
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_like
    out["sample_out"] = xs.numpy()
    out["sample_noise"] = np.stack(noises)  # [1 + n_eval, B, N, T_out, 7]
    # schedule buffers, for constant-level parity
    for name in ("betas", "alphas_cumprod", "posterior_variance",
                 "posterior_log_variance_clipped", "posterior_mean_coef1",
                 "posterior_mean_coef2", "sqrt_alphas_cumprod",
                 "sqrt_one_minus_alphas_cumprod"):
        out["sched_" + name] = getattr(gd, name).numpy()
    for name, p in gd.model.named_parameters():
        out["gd_w_" + name] = p.detach().numpy()

    os.makedirs(os.path.dirname(os.path.abspath(OUT)), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(
        f"wrote {os.path.abspath(OUT)}: dit_out {y.shape}, rtg_out {ry.shape}, "
        f"sample_out {xs.shape}, {len(noises)} noise draws, "
        f"{sum(1 for k in out if '_w_' in k)} weight tensors"
    )


def main_full() -> None:
    """Full-size CTG++ DiT denoiser golden (VERDICT r4 item 6, second half).

    The reference's real operating point: 256-d, 8 heads, ffn 1024, 2
    encoder layers, 24 agents, input_horizon 10 / future 22 (context 32),
    per-agent 200x100 road crops, 350 RTG bins
    (cfgs/model/{base,ctg_plus_plus}.yaml +
    cfgs/dataset/waymo/{base,ctg_plus_plus}.yaml). One executed DiT forward
    at B=1 with use_rtg=True (superset of embedding paths). Weights AND
    inputs are f16-snapped before the torch forward so the fixture stores
    losslessly in float16.

    Run (CPU, repo root):
        PYTHONPATH=. JAX_PLATFORMS=cpu python tools/make_ctg_goldens.py --full
    """
    g = globals()
    g["B"], g["N"] = 1, 24
    g["T_IN"], g["T_OUT"] = 10, 22
    g["T"] = 32
    g["HID"], g["HEADS"], g["FFN"] = 256, 8, 1024
    g["S"], g["P"] = 200, 100
    g["RTG_DISC"] = 350
    out_path = os.path.join(os.path.dirname(__file__), "..", "tests",
                            "goldens", "reference_ctg_full.npz")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_dit_goldens import _install_stubs

    _install_stubs()
    guidance_stub = types.ModuleType("modules.diffusion_guidance")
    guidance_stub.n_step_guided_p_sample = lambda *a, **k: None
    guidance_stub.GoalGuide = object
    guidance_stub.CollisionGuide = object
    sys.modules["modules.diffusion_guidance"] = guidance_stub
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    import torch

    ctg_arch = importlib.import_module("modules.ctg_arch")

    out: dict[str, np.ndarray] = {}
    rng = np.random.default_rng(77)
    cond_np = _make_cond(rng)
    for k, v in cond_np.items():
        if v.dtype == np.float32:
            cond_np[k] = v.astype(np.float16).astype(np.float32)
        out[f"in_{k}"] = (
            cond_np[k].astype(np.float16)
            if cond_np[k].dtype == np.float32
            else cond_np[k]
        )

    torch.manual_seed(13)
    dit = ctg_arch.DiT(_cfg(use_rtg=True)).eval()
    with torch.no_grad():
        for p_ in dit.parameters():
            p_.copy_(p_.half().float())
    future_k = (
        rng.normal(size=(B, N, T_OUT, TGT_K + 2))
        .astype(np.float16)
        .astype(np.float32)
    )
    diff_step = np.asarray([42], np.int64)
    out["in_future_k"] = future_k.astype(np.float16)
    out["in_diff_step"] = diff_step
    with torch.no_grad():
        y = dit(
            torch.from_numpy(future_k), _cond_tuple(torch, cond_np),
            torch.from_numpy(diff_step), eval=True,
        )
    out["dit_out"] = y.numpy()
    n_w = 0
    for name, p_ in dit.named_parameters():
        out["dit_w_" + name] = p_.detach().numpy().astype(np.float16)
        n_w += 1

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez_compressed(out_path, **out)
    size = os.path.getsize(os.path.abspath(out_path)) / 1e6
    print(f"wrote {os.path.abspath(out_path)}: dit_out {y.shape}, "
          f"{n_w} weight tensors, {size:.1f} MB")


if __name__ == "__main__":
    if "--full" in sys.argv:
        main_full()
    else:
        main()
