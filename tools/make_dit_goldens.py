"""Executed-reference golden for the CTG++ DiT social-attention layer.

RelativeSocialAttentionLayer (/root/reference/modules/ctg_arch.py:48-193) is
the one CTG++ block whose TPU re-design changes the computation's *shape*
(torch-geometric MessagePassing over an explicit edge list -> dense masked
attention, models/ctg/dit.py:RelativeSocialAttention). This tool EXECUTES
the reference layer and records weights/inputs/outputs so the dense
re-design is pinned to it.

torch_geometric is not installed in this image, so propagate()/softmax()
are provided by a minimal shim implementing exactly the documented
semantics this layer uses: gather x_i/x_j by edge_index
(flow source_to_target), per-edge message with scatter-softmax normalized
over each target's incoming edges, sum aggregation by target, then
update(aggregated, x). The shim holds no reference code — the layer's own
message()/update() do all the math.

Run (CPU, repo root):
    PYTHONPATH=. JAX_PLATFORMS=cpu python tools/make_dit_goldens.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                   "reference_dit.npz")

D_MODEL, NHEAD, FFN = 64, 4, 128
N_AGENTS, BATCH = 5, 6  # "batch" = batch*time in the reference layout


def _install_stubs():
    import torch

    class MiniMessagePassing(torch.nn.Module):
        """The subset of torch_geometric MessagePassing semantics
        RelativeSocialAttentionLayer uses: default flow source_to_target,
        add aggregation, update() receiving propagate's kwargs."""

        def propagate(self, edge_index, x, edge_attr):
            src, trg = edge_index[0], edge_index[1]
            x_j = x[src]  # source features per edge
            x_i = x[trg]  # target features per edge
            size_i = x.shape[0]
            msg = self.message(
                x_i=x_i, x_j=x_j, edge_attr=edge_attr, index=trg,
                ptr=None, size_i=size_i,
            )
            agg = torch.zeros(
                (size_i, msg.shape[1]), dtype=msg.dtype
            ).index_add_(0, trg, msg)
            return self.update(agg, x=x)

    def scatter_softmax(src, index, ptr=None, size_i=None):
        """torch_geometric.utils.softmax: per-group (by index) softmax with
        max subtraction and +1e-16 denominator guard."""
        n = int(size_i)
        shape = (n,) + src.shape[1:]
        maxes = torch.full(shape, float("-inf"), dtype=src.dtype)
        maxes = maxes.index_reduce_(0, index, src, "amax", include_self=True)
        out = (src - maxes[index]).exp()
        denom = torch.zeros(shape, dtype=src.dtype).index_add_(0, index, out)
        return out / (denom[index] + 1e-16)

    def _mod(name, **attrs):
        m = types.ModuleType(name)
        m.__path__ = []
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    _mod("torch_geometric")
    _mod("torch_geometric.nn")
    _mod("torch_geometric.nn.conv", MessagePassing=MiniMessagePassing)
    _mod("torch_geometric.typing", Adj=object, OptTensor=object, Size=object)
    _mod(
        "torch_geometric.utils",
        softmax=scatter_softmax, subgraph=lambda *a, **k: None,
    )
    _mod("torch_geometric.data", Data=object, Batch=object, Dataset=object,
         HeteroData=object)
    _mod("torch_scatter")
    # utils/__init__ chain (same as make_model_goldens)
    class _AnyModule(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return type(name, (), {})

    sys.modules.setdefault("nocturne_cpp", _AnyModule("nocturne_cpp"))
    hy = _mod("hydra")
    hy.compose = lambda *a, **k: None
    hy.initialize = lambda *a, **k: None
    hy.main = lambda *a, **k: (lambda f: f)
    _mod("hydra.core")
    _mod("hydra.core.global_hydra", GlobalHydra=type("GlobalHydra", (), {
        "instance": classmethod(lambda cls: type("GH", (), {
            "clear": staticmethod(lambda: None)})())
    }))
    _mod("omegaconf", OmegaConf=type("OmegaConf", (), {}))
    _mod("moviepy")
    _mod("moviepy.editor", ImageSequenceClip=object)
    _mod("pyvirtualdisplay", Display=object)
    _mod("torch_geometric.loader", DataLoader=object)
    tgs = _mod("torch_geometric.data.storage", BaseStorage=object,
               EdgeStorage=object, NodeStorage=object)
    del tgs


def main() -> None:
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    import torch

    ctg_arch = importlib.import_module("modules.ctg_arch")
    torch.manual_seed(11)
    layer = ctg_arch.RelativeSocialAttentionLayer(
        d_model=D_MODEL, nhead=NHEAD, dropout=0.1, dim_feedforward=FFN
    ).eval()

    rng = np.random.default_rng(17)
    x = rng.normal(size=(N_AGENTS, BATCH, D_MODEL)).astype(np.float32)
    pad = np.zeros((BATCH, N_AGENTS), bool)
    pad[0, -1] = True  # one padded agent in one element
    pad[3, 1:3] = True
    rel = rng.normal(size=(BATCH, N_AGENTS * N_AGENTS, D_MODEL)).astype(
        np.float32
    )

    with torch.no_grad():
        out = layer(
            torch.from_numpy(x),
            torch.from_numpy(rel),
            torch.from_numpy(pad),
        )

    store = {"in_x": x, "in_pad": pad, "in_rel": rel,
             "out": out.numpy()}
    for name, p in layer.named_parameters():
        store["w_" + name] = p.detach().numpy()
    os.makedirs(os.path.dirname(os.path.abspath(OUT)), exist_ok=True)
    np.savez_compressed(OUT, **store)
    print(f"wrote {os.path.abspath(OUT)}: out {out.shape}, "
          f"{sum(1 for k in store if k.startswith('w_'))} tensors")


if __name__ == "__main__":
    main()
