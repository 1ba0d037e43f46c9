"""Generate forward-parity goldens by EXECUTING the reference torch model.

Imports the reference's Encoder/Decoder/MapEncoder + get_causal_mask in
place (/root/reference/modules/*.py, utils/train_utils.py) with torch (CPU),
runs a full forward pass per model family (ctrl_sim / dt / il / trajeglish)
on a synthetic batch with randomly initialized weights, and stores:

  - every named parameter (the transplant source),
  - the input batch,
  - the output logits (action / rtg / future-state heads),
  - the causal masks, including the full-size 32x24x3 training mask.

tests/test_model_goldens.py transplants those exact weights into the flax
CtRLSim and asserts fp32 logit agreement <= 1e-4 — the strongest available
predictor of learning-curve parity (BASELINE config 4): if the function
computed by the architecture matches at transplanted weights, training
dynamics differences reduce to optimizer/data-order noise.

Run (CPU, repo root):
    PYTHONPATH=. JAX_PLATFORMS=cpu python tools/make_model_goldens.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                   "reference_model.npz")

# small-but-structured dims: full bin counts (they define head/embedding
# shapes), reduced H/T/A/P so the fixture stays small and CPU-fast
HID = 64
HEADS = 4
FFN = 128
T, A, P, L = 4, 4, 6, 10
ENC_LAYERS, DEC_LAYERS = 2, 2


def _cfg(family: str):
    model = types.SimpleNamespace(
        hidden_dim=HID, map_attr=3, num_road_types=8, no_actions=False,
        num_heads=HEADS, num_reward_components=3, dim_feedforward=FFN,
        dropout=0.1, state_dim=12, use_map=True, goal_dropout=0.1,
        predict_rtg=family == "ctrl_sim",
        attend_own_return_action=False,
        trajeglish=family == "trajeglish", il=family == "il",
        decision_transformer=family == "dt",
        num_transformer_encoder_layers=ENC_LAYERS,
        num_decoder_layers=DEC_LAYERS,
        predict_future_states=family == "ctrl_sim",
        encode_initial_state=True,
    )
    waymo = types.SimpleNamespace(
        accel_discretization=20, steer_discretization=50,
        rtg_discretization=350, max_timestep=90, max_num_agents=A,
        goal_dim=5, train_context_length=T, max_num_road_polylines=P,
        max_num_road_pts_per_polyline=L,
    )
    return types.SimpleNamespace(
        model=model, dataset=types.SimpleNamespace(waymo=waymo)
    )


def _import_reference_modules():
    """Import modules/{encoder,decoder,map_encoder}.py + utils/train_utils.py
    from the reference tree. They only need torch; utils/__init__ pulls in
    nocturne, which we stub."""

    class _AnyModule(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return type(name, (), {})

    sys.modules.setdefault("nocturne_cpp", _AnyModule("nocturne_cpp"))
    # hydra/omegaconf: only used by cfgs.config, which utils/__init__ imports
    hy = types.ModuleType("hydra")
    hy.compose = lambda *a, **k: None
    hy.initialize = lambda *a, **k: None
    hy.main = lambda *a, **k: (lambda f: f)
    hy.__path__ = []
    sys.modules.setdefault("hydra", hy)
    hyc = types.ModuleType("hydra.core")
    hyc.__path__ = []
    sys.modules.setdefault("hydra.core", hyc)
    hyg = types.ModuleType("hydra.core.global_hydra")
    hyg.GlobalHydra = type("GlobalHydra", (), {
        "instance": classmethod(lambda cls: type("GH", (), {
            "clear": staticmethod(lambda: None)
        })())
    })
    sys.modules.setdefault("hydra.core.global_hydra", hyg)
    om = types.ModuleType("omegaconf")
    om.OmegaConf = type("OmegaConf", (), {})
    sys.modules.setdefault("omegaconf", om)
    # utils/__init__.py imports data/sim/viz helpers that drag in
    # torch_geometric / moviepy; stub them (encoder/decoder don't use them)
    for name in ("torch_scatter", "moviepy", "pyvirtualdisplay"):
        mod = types.ModuleType(name)
        mod.__path__ = []
        sys.modules.setdefault(name, mod)
    med = types.ModuleType("moviepy.editor")
    med.ImageSequenceClip = object
    sys.modules.setdefault("moviepy.editor", med)
    sys.modules.setdefault(
        "pyvirtualdisplay",
        types.ModuleType("pyvirtualdisplay"),
    )
    sys.modules["pyvirtualdisplay"].Display = object
    tg = types.ModuleType("torch_geometric")
    tg.__path__ = []
    sys.modules.setdefault("torch_geometric", tg)
    tgd = types.ModuleType("torch_geometric.data")
    tgd.Dataset = object
    tgd.HeteroData = object
    tgd.__path__ = []
    sys.modules.setdefault("torch_geometric.data", tgd)
    tgs = types.ModuleType("torch_geometric.data.storage")
    tgs.BaseStorage = object
    tgs.EdgeStorage = object
    tgs.NodeStorage = object
    sys.modules.setdefault("torch_geometric.data.storage", tgs)
    tgl = types.ModuleType("torch_geometric.loader")
    tgl.DataLoader = object
    sys.modules.setdefault("torch_geometric.loader", tgl)
    # modules/__init__ also imports ctg_arch (MessagePassing etc.); stub the
    # torch_geometric bits it needs for class *definition* (never run here)
    import torch

    tgd.Data = object
    tgd.Batch = object
    tgn = types.ModuleType("torch_geometric.nn")
    tgn.__path__ = []
    sys.modules.setdefault("torch_geometric.nn", tgn)
    tgnc = types.ModuleType("torch_geometric.nn.conv")
    tgnc.MessagePassing = torch.nn.Module
    sys.modules.setdefault("torch_geometric.nn.conv", tgnc)
    tgt = types.ModuleType("torch_geometric.typing")
    tgt.Adj = object
    tgt.OptTensor = object
    tgt.Size = object
    sys.modules.setdefault("torch_geometric.typing", tgt)
    tgu = types.ModuleType("torch_geometric.utils")
    tgu.softmax = lambda *a, **k: None
    tgu.subgraph = lambda *a, **k: None
    sys.modules.setdefault("torch_geometric.utils", tgu)

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    enc = importlib.import_module("modules.encoder")
    dec = importlib.import_module("modules.decoder")
    tu = importlib.import_module("utils.train_utils")
    return enc, dec, tu


class _Batch(dict):
    """Duck-types the MotionData access pattern data['agent'].agent_states."""


def _make_batch(torch, rng: np.random.Generator, cfg, B: int = 2):
    ag = rng.normal(size=(B, A, T, 8)).astype(np.float32)
    ag[..., -1] = (rng.uniform(size=(B, A, T)) > 0.2).astype(np.float32)
    ag[:, 0, :, -1] = 1.0  # keep at least one agent alive
    types_oh = np.eye(5, dtype=np.float32)[rng.integers(0, 5, (B, A))]
    goals = rng.normal(size=(B, A, 5)).astype(np.float32)
    actions = rng.integers(0, 1000, (B, A, T)).astype(np.float32)
    rtgs = rng.integers(0, 350, (B, A, T, 3)).astype(np.float32)
    timesteps = np.broadcast_to(np.arange(T)[None, None, :], (B, A, T)).copy()
    road_points = rng.normal(size=(B, P, L, 3)).astype(np.float32)
    road_points[..., -1] = (rng.uniform(size=(B, P, L)) > 0.3).astype(np.float32)
    road_points[:, -1, :, -1] = 0.0  # one fully-invalid polyline
    road_types = np.eye(8, dtype=np.float32)[rng.integers(0, 8, (B, P))]

    inputs = dict(
        agent_states=ag, agent_types=types_oh, goals=goals, actions=actions,
        rtgs=rtgs, timesteps=timesteps, road_points=road_points,
        road_types=road_types,
    )
    if cfg.model.decision_transformer:
        # DT consumes continuous normalized rtgs
        inputs["rtgs"] = rng.uniform(0, 1, (B, A, T, 3)).astype(np.float32)

    agent = types.SimpleNamespace(
        agent_states=torch.from_numpy(ag),
        agent_types=torch.from_numpy(types_oh),
        goals=torch.from_numpy(goals),
        actions=torch.from_numpy(actions),
        rtgs=torch.from_numpy(inputs["rtgs"]),
        timesteps=torch.from_numpy(timesteps).long(),
    )
    map_ = types.SimpleNamespace(
        road_points=torch.from_numpy(road_points),
        road_types=torch.from_numpy(road_types),
    )
    data = _Batch()
    data["agent"] = agent
    data["map"] = map_
    return inputs, data


def main() -> None:
    enc_mod, dec_mod, tu = _import_reference_modules()
    import torch

    torch.manual_seed(7)
    out: dict[str, np.ndarray] = {}

    rng = np.random.default_rng(99)
    for family in ["ctrl_sim", "dt", "il", "trajeglish"]:
        cfg = _cfg(family)
        encoder = enc_mod.Encoder(cfg).eval()
        decoder = dec_mod.Decoder(cfg).eval()
        inputs, data = _make_batch(torch, rng, cfg)

        with torch.no_grad():
            scene_enc = encoder(data, eval=True)
            preds = decoder(data, scene_enc, eval=True)

        pfx = f"{family}_"
        for k, v in inputs.items():
            out[pfx + "in_" + k] = v
        for name, p in list(encoder.named_parameters()) + [
            ("dec." + n, p) for n, p in decoder.named_parameters()
        ]:
            out[pfx + "w_" + name] = p.detach().numpy()
        out[pfx + "out_action_preds"] = preds["action_preds"].numpy()
        if "rtg_preds" in preds:
            out[pfx + "out_rtg_preds"] = preds["rtg_preds"].numpy()
        if "state_preds" in preds:
            out[pfx + "out_state_preds"] = preds["state_preds"].numpy()
        out[pfx + "mask"] = decoder.causal_mask.numpy()
        # intermediate checkpoints for debugging transplant mismatches
        out[pfx + "mid_stacked"] = scene_enc["stacked_embeddings"].numpy()
        out[pfx + "mid_memory"] = scene_enc["encoder_embeddings"].numpy()
        out[pfx + "mid_pad"] = scene_enc["src_key_padding_mask"].numpy()
        print(f"[goldens] {family}: action_preds "
              f"{preds['action_preds'].shape}, {sum(1 for k in out if k.startswith(pfx + 'w_'))} tensors")

    # ---- executed optimizer partition + LR schedule --------------------
    # configure_optimizers (models/ctrl_sim.py:242-282) + create_lambda_lr
    # (utils/train_utils.py:5-12), run on the real reference module
    import torch

    pl = types.ModuleType("pytorch_lightning")
    pl.LightningModule = torch.nn.Module
    pl.__path__ = []
    sys.modules.setdefault("pytorch_lightning", pl)
    plu = types.ModuleType("pytorch_lightning.utilities")
    plu.grad_norm = lambda *a, **k: {}
    sys.modules.setdefault("pytorch_lightning.utilities", plu)
    # models/__init__ imports modules.diffusion, which hits the reference's
    # genuinely missing diffusion_guidance module; stub the three names it
    # wants (the very defect our models/ctg/guidance.py fixes)
    dg = types.ModuleType("modules.diffusion_guidance")
    dg.n_step_guided_p_sample = lambda *a, **k: None
    dg.GoalGuide = object
    dg.CollisionGuide = object
    sys.modules.setdefault("modules.diffusion_guidance", dg)
    import importlib

    ref_ctrl_sim = importlib.import_module("models.ctrl_sim")

    class _Train(dict):
        # cfg.train is read both attribute- and item-style
        def __getattr__(self, k):
            return self[k]

    cfg = _cfg("ctrl_sim")
    cfg.train = _Train(
        weight_decay=0.1, lr=5e-4, warmup_steps=500, max_steps=200_000,
        finetuning=False, track=False,
    )
    cfg.dataset.waymo.train_context_length = T
    model = ref_ctrl_sim.CtRLSim.__new__(ref_ctrl_sim.CtRLSim)
    torch.nn.Module.__init__(model)
    model.cfg = cfg
    model.cfg_model = cfg.model
    model.cfg_rl_waymo = cfg.dataset.waymo
    enc_mod2 = importlib.import_module("modules.encoder")
    dec_mod2 = importlib.import_module("modules.decoder")
    model.encoder = enc_mod2.Encoder(cfg)
    model.decoder = dec_mod2.Decoder(cfg)
    [optimizer], sched = model.configure_optimizers()
    decay_names = sorted(
        n for n, p in model.named_parameters()
        if any(p is q for q in optimizer.param_groups[0]["params"])
    )
    no_decay_names = sorted(
        n for n, p in model.named_parameters()
        if any(p is q for q in optimizer.param_groups[1]["params"])
    )
    out["opt_decay_names"] = np.array(decay_names)
    out["opt_no_decay_names"] = np.array(no_decay_names)
    lam = tu.create_lambda_lr(cfg)
    steps = np.array([0, 1, 100, 250, 499, 500, 501, 1000, 50_000, 100_000,
                      199_999, 200_000])
    out["opt_lr_steps"] = steps
    out["opt_lr_factors"] = np.array([lam(int(s)) for s in steps], np.float64)
    print(f"[goldens] optimizer: {len(decay_names)} decay, "
          f"{len(no_decay_names)} no-decay params")

    # full-size training mask (32 steps x 24 agents x 3 types) + the
    # attend_own_return_action variant on a reduced size
    full = types.SimpleNamespace(
        model=types.SimpleNamespace(
            decision_transformer=False, attend_own_return_action=False
        ),
        dataset=types.SimpleNamespace(
            waymo=types.SimpleNamespace(max_num_agents=24)
        ),
    )
    out["mask_full_default"] = tu.get_causal_mask(full, 32, 3).numpy()
    full.model.attend_own_return_action = True
    out["mask_small_strict"] = tu.get_causal_mask(full, 4, 3).numpy()
    full.model.attend_own_return_action = False
    full.model.decision_transformer = True
    out["mask_small_dt"] = tu.get_causal_mask(full, 4, 3).numpy()

    os.makedirs(os.path.dirname(os.path.abspath(OUT)), exist_ok=True)
    np.savez_compressed(OUT, **out)
    size = os.path.getsize(os.path.abspath(OUT)) / 1e6
    print(f"wrote {os.path.abspath(OUT)} ({len(out)} arrays, {size:.1f} MB)")


def main_full() -> None:
    """Full-size ctrl_sim forward golden (VERDICT r4 item 6).

    The reference's real operating point — 256-d, 8 heads, ffn 1024, 2
    encoder + 4 decoder layers, 24 agents, 32-step context, 200x100 road
    polylines (cfgs/model/base.yaml + cfgs/model/ctrl_sim.yaml +
    cfgs/dataset/waymo/base.yaml) — executed on torch CPU. The reduced-dim
    goldens exercise the same code path, but layout/precision bugs are
    shape-dependent; this pins the deployed shape.

    Every weight is snapped to float16 before the forward runs and stored
    as float16 (lossless for snapped values), so the ~8M-parameter fixture
    stays ~16 MB instead of 32. The flax side casts back to f32 and must
    match the torch logits to 1e-4 at B=1.

    Run (CPU, repo root):
        PYTHONPATH=. JAX_PLATFORMS=cpu python tools/make_model_goldens.py --full
    """
    global HID, HEADS, FFN, T, A, P, L, ENC_LAYERS, DEC_LAYERS
    HID, HEADS, FFN = 256, 8, 1024
    T, A, P, L = 32, 24, 200, 100
    ENC_LAYERS, DEC_LAYERS = 2, 4
    out_path = os.path.join(os.path.dirname(__file__), "..", "tests",
                            "goldens", "reference_model_full.npz")

    enc_mod, dec_mod, _ = _import_reference_modules()
    import torch

    torch.manual_seed(11)
    rng = np.random.default_rng(1234)
    cfg = _cfg("ctrl_sim")
    encoder = enc_mod.Encoder(cfg).eval()
    decoder = dec_mod.Decoder(cfg).eval()
    with torch.no_grad():
        for p in list(encoder.parameters()) + list(decoder.parameters()):
            p.copy_(p.half().float())  # f16-snap so storage is lossless
    inputs, data = _make_batch(torch, rng, cfg, B=1)

    with torch.no_grad():
        scene_enc = encoder(data, eval=True)
        preds = decoder(data, scene_enc, eval=True)

    out: dict[str, np.ndarray] = {}
    for k, v in inputs.items():
        out["full_in_" + k] = v
    n_w = 0
    for name, p in list(encoder.named_parameters()) + [
        ("dec." + n, p) for n, p in decoder.named_parameters()
    ]:
        out["full_w_" + name] = p.detach().numpy().astype(np.float16)
        n_w += 1
    out["full_out_action_preds"] = preds["action_preds"].numpy()
    out["full_out_rtg_preds"] = preds["rtg_preds"].numpy()
    out["full_out_state_preds"] = preds["state_preds"].numpy()
    out["full_mask"] = decoder.causal_mask.numpy()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez_compressed(out_path, **out)
    size = os.path.getsize(os.path.abspath(out_path)) / 1e6
    print(f"wrote {os.path.abspath(out_path)} ({n_w} weight tensors, "
          f"{size:.1f} MB)")


if __name__ == "__main__":
    if "--full" in sys.argv:
        main_full()
    else:
        main()
