"""Device mesh construction and sharding specs.

The reference's only distribution strategy is 4-GPU DDP via
PyTorch-Lightning (train.py:71-82, NCCL all-reduce). The TPU-native
equivalent is GSPMD: one mesh with a ``data`` axis for batch/env sharding
and a ``model`` axis reserved for tensor parallelism (the CtRL-Sim model is
small — 256-d — so model parallelism is off by default, but the axis exists
so larger configs shard without code changes).

Environments shard over ``data`` exactly like batches do — the "sequence
scale" axis of this workload is the number of parallel scenarios
(SURVEY.md §2.3), which rides ICI within a slice and DCN across slices.
Gradient reduction is XLA ``psum`` inserted automatically by ``jit`` given
these shardings — the psum travels ICI within a slice; no NCCL, no RPC.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``;
``jax.devices()`` then spans all hosts and the same code runs unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshSpec:
    mesh: Mesh

    @property
    def data_sharding(self) -> NamedSharding:
        """Shard the leading (batch / env) axis over `data`."""
        return NamedSharding(self.mesh, P("data"))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def shard_batch(self, tree):
        """Device-put a pytree with its leading axis sharded over `data`."""
        return jax.device_put(tree, self.data_sharding)

    def replicate(self, tree):
        return jax.device_put(tree, self.replicated)


def make_mesh(
    data: int | None = None,
    model: int = 1,
    devices: list | None = None,
) -> MeshSpec:
    """Build a (data, model) mesh over all visible devices by default."""
    devs = devices if devices is not None else jax.devices()
    n = len(devs)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.array(devs).reshape(data, model)
    return MeshSpec(mesh=Mesh(arr, axis_names=("data", "model")))
