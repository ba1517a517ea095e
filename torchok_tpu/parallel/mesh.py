"""Mesh and sharding utilities.

The reference's distributed story is Lightning DDP (SURVEY.md §2.10); the
TPU-native equivalent is GSPMD over a device mesh:

* axis ``data`` — data parallelism (the DDP-equivalent, first-class);
* ``fsdp`` rule — additionally shards each parameter's largest divisible
  axis over ``data`` (ZeRO-3-style memory scaling the reference never had);
* axis ``model`` — tensor parallelism for wide output layers: metric-learning
  heads (ArcFace over 10k-100k classes, reference
  heads/classification/arcface_head.py) dominate parameter count and logits
  bandwidth, so their class dimension is sharded over ``model`` and XLA
  inserts the reduce for the softmax over sharded logits.

* ``spatial`` strategy — the CV analog of sequence parallelism: the image
  HEIGHT is sharded over ``model`` in addition to batch-over-``data``
  (MLPerf-style spatial partitioning). XLA's GSPMD inserts the conv halo
  exchanges and global-pool/BN reduces automatically, so large-image /
  small-per-device-batch regimes (high-res segmentation, giant detection
  inputs) scale past the point where pure dp starves devices.

Pipeline / expert parallelism intentionally do not exist: the reference is
a CV trainer with ≤~1B-param encoders and no MoE (SURVEY.md §2.10 "NOT
present"); dp(+fsdp)×tp plus spatial partitioning covers its scale
envelope on a TPU pod slice.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# The engine announces its mesh here so mesh-aware ops (e.g. the fused
# Pallas window attention, which must wrap itself in shard_map to compose
# with the GSPMD step) can pick it up at trace time without threading the
# mesh through every module.
_CURRENT_MESH: Optional[Mesh] = None


def set_current_mesh(mesh: Optional[Mesh]) -> None:
    global _CURRENT_MESH
    _CURRENT_MESH = mesh


def get_current_mesh() -> Optional[Mesh]:
    return _CURRENT_MESH


_DISTRIBUTED_INITIALIZED = False


def init_distributed(num_nodes: int = 1) -> bool:
    """Multi-host runtime bring-up — the reference's ``trainer.num_nodes``
    surface (Lightning multi-node DDP; config_structure.py:137-140).

    With ``num_nodes > 1`` (or coordinator env vars already set) this calls
    ``jax.distributed.initialize``: argless on TPU pods, where process
    topology comes from the platform metadata, or from the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars
    elsewhere. After it, ``jax.devices()`` is the GLOBAL device list, so
    the engine's mesh spans all hosts and the compiled step's collectives
    ride ICI/DCN; per-process data feeding is handled by the loader's
    ``process_shard`` and the trainer's
    ``jax.make_array_from_process_local_data`` placement.

    Idempotent. Returns True when a multi-process runtime is active.
    """
    global _DISTRIBUTED_INITIALIZED
    import os
    want = num_nodes > 1 or "JAX_COORDINATOR_ADDRESS" in os.environ
    if want and not _DISTRIBUTED_INITIALIZED:
        kwargs = {}
        addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if addr:
            pid = os.environ.get("JAX_PROCESS_ID")
            if pid is None:
                # defaulting would make EVERY host claim process 0 and
                # deadlock coordination — fail loudly instead
                raise ValueError(
                    "JAX_COORDINATOR_ADDRESS is set but JAX_PROCESS_ID is "
                    "not; export a distinct JAX_PROCESS_ID (0..N-1) per "
                    "host, plus JAX_NUM_PROCESSES")
            kwargs = dict(
                coordinator_address=addr,
                num_processes=int(os.environ.get("JAX_NUM_PROCESSES", num_nodes)),
                process_id=int(pid))
        jax.distributed.initialize(**kwargs)
        _DISTRIBUTED_INITIALIZED = True
    return jax.process_count() > 1


def build_mesh(devices: Optional[Sequence] = None,
               axis_names: Sequence[str] = ("data",),
               model_parallel: int = 1) -> Mesh:
    """1D ('data') or 2D ('data', 'model') mesh. ``model_parallel`` splits
    the device list; data parallelism takes the remaining factor. The model
    axis is placed innermost so tensor-parallel collectives ride the
    fastest ICI links."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if model_parallel > 1:
        if n % model_parallel != 0:
            raise ValueError(f"{n} devices not divisible by "
                             f"model_parallel={model_parallel}")
        arr = np.array(devices).reshape(n // model_parallel, model_parallel)
        return Mesh(arr, axis_names=("data", "model"))
    arr = np.array(devices)
    if len(axis_names) > 1:
        raise ValueError("pass model_parallel for multi-axis meshes")
    return Mesh(arr, axis_names=tuple(axis_names))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def spatial_image_sharding(mesh: Mesh) -> NamedSharding:
    """Spatial partitioning for NHWC image batches: batch over 'data', image
    HEIGHT over 'model' (trainer ``strategy: spatial``). Convs over the
    H-sharded activations compile to windowed einsums with halo exchanges on
    the 'model' axis (XLA GSPMD); reductions spanning H (global pooling,
    BatchNorm statistics) get the collectives inserted automatically, so
    the math matches the single-device run up to f32 reduction-ordering
    rounding (the distributed parity tests assert to that tolerance)."""
    return NamedSharding(mesh, P("data", "model"))


def fsdp_sharding(mesh: Mesh, tree: Any, axis: str = "data"):
    """Per-leaf sharding: partition the largest divisible dimension."""
    n = mesh.shape[axis]

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


def tp_sharding(mesh: Mesh, tree: Any, head_prefixes: Sequence[str] = ("head",),
                fsdp: bool = False):
    """Tensor-parallel sharding over the 'model' axis.

    Kernels under any of ``head_prefixes`` (pytree top-level keys) get their
    output (last) dimension sharded over 'model' when divisible — for
    classification/ArcFace heads this splits the class dimension, so each
    device holds 1/tp of the class weights and computes 1/tp of the logits;
    XLA inserts the cross-device reduce for the softmax normalizer.
    Everything else is replicated over 'model' (and optionally fsdp-sharded
    over 'data').
    """
    tp = mesh.shape["model"]
    dp = mesh.shape["data"]

    def spec_for(path, leaf):
        if not hasattr(leaf, "shape") or getattr(leaf, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        in_head = any(k in head_prefixes for k in keys)
        if in_head and leaf.ndim >= 1 and leaf.shape[-1] % tp == 0 \
                and leaf.shape[-1] >= tp:
            spec = [None] * leaf.ndim
            spec[-1] = "model"
            return NamedSharding(mesh, P(*spec))
        if fsdp:
            sizes = list(leaf.shape)
            best = int(np.argmax(sizes))
            if sizes[best] % dp == 0 and sizes[best] >= dp:
                spec = [None] * leaf.ndim
                spec[best] = "data"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, tree)
