"""Metric base: functional accumulator states.

TPU-native re-design of the torchmetrics contract the reference builds on
(reference: torchok/metrics/metrics_manager.py:11-76). A metric owns no
tensors; its state is an explicit pytree of device arrays, updated by a pure
(jittable) ``update`` and read out by a host-side ``compute``. Under GSPMD
the update consumes batch-sharded step outputs, so cross-replica reduction
is handled by XLA — the functional equivalent of torchmetrics
``dist_reduce_fx`` state sync.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp


class Metric:
    """Base metric. Subclasses define ``empty_state``, ``update``, ``compute``."""

    # Set False for metrics whose state grows per batch (e.g. concatenated
    # embeddings) — those updates must stay out of jit.
    jittable_update: bool = True

    def __init__(self, **params):
        self.params = params

    def empty_state(self) -> Any:
        raise NotImplementedError

    def update(self, state: Any, **kwargs) -> Any:
        raise NotImplementedError

    def compute(self, state: Any) -> Union[float, Dict[str, float]]:
        raise NotImplementedError


class MeanState(Metric):
    """Helper base for metrics of the form sum(values)/count."""

    def empty_state(self):
        return {"total": jnp.zeros((), jnp.float32), "count": jnp.zeros((), jnp.float32)}

    def _accumulate(self, state, values: jnp.ndarray, weights: Optional[jnp.ndarray] = None):
        values = values.astype(jnp.float32)
        if weights is None:
            total = state["total"] + jnp.sum(values)
            count = state["count"] + values.size
        else:
            total = state["total"] + jnp.sum(values * weights)
            count = state["count"] + jnp.sum(weights)
        return {"total": total, "count": count}

    def compute(self, state):
        return float(state["total"] / jnp.maximum(state["count"], 1e-12))
