"""Joint training-trajectory parity: EXECUTE the reference's torch training
loop (model forward + compute_loss + AdamW with the whitelist/blacklist
decay partition + LambdaLR warmup-linear-decay + grad-clip 10,
/root/reference/models/ctrl_sim.py:192-282 + utils/train_utils.py:5-12 +
train.py:71-82) for N steps from a recorded init on recorded batches, and
save the loss/lr trajectory plus the initial and final weights.

tests/test_training_parity.py replays the SAME batches from the SAME
transplanted init through the JAX trainer (training/trainer.py) and asserts
the two loss trajectories stay within numerical tolerance — turning
BASELINE config 4 ("learning-curve parity") from "recipe pinned" into
"trajectory matched".

Dropout is disabled on both sides (dropout masks are framework-RNG
specific; with them on, parity would only hold in distribution).

Run (CPU, repo root):
    PYTHONPATH=. JAX_PLATFORMS=cpu python tools/make_training_parity.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                   "reference_training.npz")

HID, HEADS, FFN = 32, 2, 64
T, A, P, L = 4, 4, 6, 10
ENC_LAYERS, DEC_LAYERS = 2, 2
BATCH = 4
STEPS = 200
WARMUP, MAX_STEPS = 20, 200  # scaled-down schedule so decay actually moves
LR, WEIGHT_DECAY, CLIP = 5e-4, 1e-4, 10.0


class _TrainCfg(types.SimpleNamespace):
    """create_lambda_lr accesses cfg.train['warmup_steps'] dict-style."""

    def __getitem__(self, k):
        return getattr(self, k)


def _cfg():
    model = types.SimpleNamespace(
        hidden_dim=HID, map_attr=3, num_road_types=8, no_actions=False,
        num_heads=HEADS, num_reward_components=3, dim_feedforward=FFN,
        dropout=0.0, state_dim=12, use_map=True, goal_dropout=0.0,
        predict_rtg=True, attend_own_return_action=False,
        trajeglish=False, il=False, decision_transformer=False,
        num_transformer_encoder_layers=ENC_LAYERS,
        num_decoder_layers=DEC_LAYERS,
        predict_future_states=True, local_frame_predictions=False,
        supervise_moving=True, encode_initial_state=True,
        loss_action_coef=1.0,
    )
    waymo = types.SimpleNamespace(
        accel_discretization=20, steer_discretization=50,
        rtg_discretization=350, max_timestep=90, max_num_agents=A,
        goal_dim=5, train_context_length=T, max_num_road_polylines=P,
        max_num_road_pts_per_polyline=L,
    )
    train = _TrainCfg(
        lr=LR, weight_decay=WEIGHT_DECAY, warmup_steps=WARMUP,
        max_steps=MAX_STEPS, gradient_clip_val=CLIP, finetuning=False,
    )
    return types.SimpleNamespace(
        model=model, train=train, dataset=types.SimpleNamespace(waymo=waymo)
    )


def _stub_lightning():
    """models/ctrl_sim.py imports pytorch_lightning (not in this image);
    its LightningModule surface used at construction is save_hyperparameters
    only — the training loop is driven manually here."""
    import torch

    class _PLModule(torch.nn.Module):
        def save_hyperparameters(self, *a, **k):
            pass

    pl = types.ModuleType("pytorch_lightning")
    pl.LightningModule = _PLModule
    pl.__path__ = []
    sys.modules.setdefault("pytorch_lightning", pl)
    plu = types.ModuleType("pytorch_lightning.utilities")
    plu.grad_norm = lambda *a, **k: {}
    sys.modules.setdefault("pytorch_lightning.utilities", plu)
    # matplotlib may be absent headless-safe either way
    try:
        import matplotlib

        matplotlib.use("Agg")
    except Exception:
        mpl = types.ModuleType("matplotlib")
        mpl.__path__ = []
        sys.modules.setdefault("matplotlib", mpl)
        sys.modules.setdefault("matplotlib.pyplot", types.ModuleType("matplotlib.pyplot"))


def make_batches(rng: np.ndarray):
    """STEPS batches in the shared make_model_goldens layout."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_model_goldens import _make_batch

    import torch

    cfg = _cfg()
    batches_np, batches_torch = [], []
    for _ in range(STEPS):
        inputs, data = _make_batch(torch, rng, cfg)
        # moving mask: compute_loss consumes it under supervise_moving
        moving = (rng.uniform(size=(inputs["agent_states"].shape[0], A)) > 0.3).astype(
            np.float32
        )
        inputs["moving_agent_mask"] = moving
        data["agent"].moving_agent_mask = torch.from_numpy(moving)
        batches_np.append(inputs)
        batches_torch.append(data)
    return batches_np, batches_torch


def main() -> None:
    _stub_lightning()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_model_goldens import _import_reference_modules

    _import_reference_modules()
    # models/__init__ pulls in models/ctg_plus_plus -> modules/diffusion,
    # whose modules.diffusion_guidance import is shipped broken — stub it
    guidance_stub = types.ModuleType("modules.diffusion_guidance")
    guidance_stub.n_step_guided_p_sample = lambda *a, **k: None
    guidance_stub.GoalGuide = object
    guidance_stub.CollisionGuide = object
    sys.modules["modules.diffusion_guidance"] = guidance_stub
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    import torch

    ctrl_sim = importlib.import_module("models.ctrl_sim")

    torch.manual_seed(123)
    cfg = _cfg()
    model = ctrl_sim.CtRLSim(cfg)
    model.train()
    # Reference quirk: encoder.py:42-46 / decoder.py:16-21 construct
    # nn.TransformerEncoder/DecoderLayer WITHOUT a dropout argument — torch's
    # default p=0.1 is hardwired and cfg.model.dropout is never consulted.
    # (In the DEFAULT config both frameworks therefore train with 0.1 in the
    # same places; the flax rebuild wires cfg.dropout through, which only
    # diverges if someone sets dropout != 0.1.) For a deterministic
    # trajectory comparison, zero every dropout in place on the torch side
    # to match the dropout-free JAX run.
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        if isinstance(m, torch.nn.MultiheadAttention):
            m.dropout = 0.0

    out: dict[str, np.ndarray] = {}
    for name, p in model.state_dict().items():
        out["init_" + name] = p.detach().numpy().copy()

    # the reference's own optimizer construction (decay partition + LambdaLR)
    [optimizer], sched_dict = model.configure_optimizers()
    scheduler = sched_dict["scheduler"]

    rng = np.random.default_rng(2024)
    batches_np, batches_torch = make_batches(rng)

    losses, lrs = [], []
    components: dict[str, list] = {
        k: [] for k in ("loss_actions", "loss_rtg_goal", "loss_rtg_veh",
                        "loss_rtg_road", "loss_state")
    }
    for step, data in enumerate(batches_torch):
        preds = model(data)
        loss_dict = model.compute_loss(data, preds)
        loss = loss_dict["loss_actions"]
        if cfg.model.predict_rtg:
            loss = loss + loss_dict["loss_rtg_goal"] + loss_dict["loss_rtg_veh"] + loss_dict["loss_rtg_road"]
        if cfg.model.predict_future_states:
            loss = loss + loss_dict["loss_state"]
        for k in components:
            components[k].append(float(loss_dict[k].detach()))
        optimizer.zero_grad()
        loss.backward()
        # Lightning applies gradient_clip_val as a global 2-norm clip before
        # the optimizer step (train.py:80)
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
        optimizer.step()
        scheduler.step()
        losses.append(float(loss.detach()))
        lrs.append(float(optimizer.param_groups[0]["lr"]))

    out["loss"] = np.asarray(losses, np.float64)
    out["lr"] = np.asarray(lrs, np.float64)
    for k, v in components.items():
        out[k] = np.asarray(v, np.float64)
    for name, p in model.state_dict().items():
        out["final_" + name] = p.detach().numpy().copy()
    # batches, flattened
    for i, b in enumerate(batches_np):
        for k, v in b.items():
            out[f"b{i}_{k}"] = v

    os.makedirs(os.path.dirname(os.path.abspath(OUT)), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(
        f"wrote {os.path.abspath(OUT)}: {STEPS} steps, loss[0]={losses[0]:.4f} "
        f"loss[-1]={losses[-1]:.4f}, lr[0]={lrs[0]:.2e} lr[-1]={lrs[-1]:.2e}"
    )


if __name__ == "__main__":
    main()
