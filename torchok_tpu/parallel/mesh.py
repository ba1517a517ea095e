"""Mesh and sharding utilities.

The reference's distributed story is Lightning DDP (SURVEY.md §2.10); the
TPU-native equivalent is GSPMD over a device mesh. One axis ('data') carries
data parallelism; the fsdp rule additionally shards each parameter's largest
divisible axis over the same mesh (ZeRO-3-style memory scaling the reference
never had).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(devices: Optional[Sequence] = None,
               axis_names: Sequence[str] = ("data",)) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    arr = np.array(devices)
    if len(axis_names) > 1:
        raise NotImplementedError("multi-axis meshes land with model parallelism")
    return Mesh(arr, axis_names=tuple(axis_names))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def fsdp_sharding(mesh: Mesh, tree: Any, axis: str = "data"):
    """Per-leaf sharding: partition the largest divisible dimension."""
    n = mesh.devices.size

    def spec_for(leaf):
        if not hasattr(leaf, "shape") or getattr(leaf, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        sizes = list(leaf.shape)
        best = int(np.argmax(sizes))
        if sizes[best] % n == 0 and sizes[best] >= n:
            spec = [None] * leaf.ndim
            spec[best] = axis
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, tree)
