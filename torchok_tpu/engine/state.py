"""Train state pytree."""
from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    """Everything the jitted train step threads through.

    ``grad_mask`` realizes freeze policies (reference FreezeUnfreeze mutates
    ``requires_grad``; functionally we multiply gradients by a 0/1 pytree —
    updating the mask between epochs retraces once per change).
    """
    params: Any
    batch_stats: Any
    buffers: Any
    opt_state: Any
    grad_mask: Any
    bn_mask: Any  # 1.0 = update batch_stats leaf, 0.0 = keep frozen stats
    step: jnp.ndarray  # int32 scalar

    @property
    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        if self.buffers:
            v["buffers"] = self.buffers
        return v
