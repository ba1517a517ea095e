"""BaseTask (reference: torchok/tasks/base.py:17-204).

The reference BaseTask is a LightningModule; here a task is a thin object
owning

* a Flax module (``self.model``) whose ``__call__(batch, train)`` is the
  reference's ``forward_with_gt`` — it consumes the batch dict and returns
  the outputs dict the JointLoss / MetricsManager mappings refer to;
* the JointLoss and MetricsManager built through the Constructor;
* variable initialization (params / batch_stats / buffers collections) from
  the config ``inputs`` spec (CHW in YAML for reference parity, converted to
  NHWC here);
* checkpoint-surgery hooks (partial loading, reference load.py semantics).

The jitted train/eval step functions live in the engine; cross-rank loss
averaging needs no explicit all_gather (reference base.py:163-185) because
the loss mean over the GSPMD-sharded batch axis is already global.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.constructor.config_structure import Phase
from torchok_tpu.constructor.constructor import Constructor
from torchok_tpu.data.loader import DataLoader
from torchok_tpu.models.base import chw_to_nhwc_shape

logger = logging.getLogger(__name__)

_PRECISION_TO_DTYPE = {
    "64": jnp.float64, 64: jnp.float64,
    "32": jnp.float32, 32: jnp.float32,
    "16": jnp.bfloat16, 16: jnp.bfloat16,  # fp16 has no MXU path on TPU; use bf16
    "bf16": jnp.bfloat16, "16-mixed": jnp.bfloat16, "bf16-mixed": jnp.bfloat16,
}


class BaseTask:
    def __init__(self, hparams: ConfigNode, **_):
        self._hparams = hparams
        self._constructor = Constructor(hparams)
        self.losses = self._constructor.configure_losses()
        self.metrics_manager = self._constructor.configure_metrics_manager()

        precision = hparams.get("trainer", {}).get("precision", 32) if hparams.get("trainer") else 32
        self.compute_dtype = _PRECISION_TO_DTYPE.get(precision, jnp.float32)

        # example inputs registered from the `inputs:` config (export + init)
        self._input_shapes: List[Tuple[int, ...]] = []
        self._input_dtypes: List[Any] = []
        task_params = hparams.task.get("params") or {}
        for spec in task_params.get("inputs") or []:
            shape = chw_to_nhwc_shape(list(spec["shape"]))
            self._input_shapes.append(shape)
            self._input_dtypes.append(spec.get("dtype", "float32"))

        self.model: Optional[nn.Module] = None  # set by subclass

    # ------------------------------------------------------------------
    @property
    def hparams(self) -> ConfigNode:
        return self._hparams

    @property
    def constructor(self) -> Constructor:
        return self._constructor

    @property
    def input_shapes(self) -> List[Tuple[int, ...]]:
        return self._input_shapes

    def example_batch(self, batch_size: int = 2) -> Dict[str, jnp.ndarray]:
        if not self._input_shapes:
            raise ValueError("Task config has no `inputs` spec to build example inputs from")
        image = jnp.zeros((batch_size, *self._input_shapes[0]), self.compute_dtype)
        return {"image": image}

    # ------------------------------------------------------------------
    def init_variables(self, rng: jax.Array, batch: Optional[Dict[str, Any]] = None):
        batch = batch or self.example_batch()
        rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
        # init in train mode: train-only state (e.g. the ArcFace dynamic-margin
        # step buffer, reference arcface_head.py:69) must exist in the initial
        # variables so the engine threads it through the train step
        n = next(iter(batch.values())).shape[0]
        with_targets = dict(batch)
        for key, value in self.example_targets(n).items():
            with_targets.setdefault(key, value)
        candidates = [(with_targets, True)]
        if with_targets.keys() != batch.keys():
            candidates.append((batch, True))
        for candidate, train in candidates:
            try:
                return self.model.init(rngs, candidate, train=train)
            except (ValueError, KeyError, TypeError):
                continue
        return self.model.init(rngs, batch, train=False)

    def example_targets(self, batch_size: int) -> Dict[str, jnp.ndarray]:
        """Dummy target entries for train-mode init; tasks with non-standard
        target keys (multi-head) override."""
        return {"target": jnp.zeros((batch_size,), jnp.int32)}

    def apply_model(self, variables, batch, train: bool, rngs=None,
                    mutable: Sequence[str] = ()) -> Tuple[Dict[str, Any], Dict]:
        """forward_with_gt: returns (outputs dict, updated mutable collections)."""
        out = self.model.apply(variables, batch, train=train, rngs=rngs,
                               mutable=list(mutable) if mutable else False)
        if mutable:
            return out
        return out, {}

    def no_weight_decay(self) -> List[str]:
        mods = [m for m in [getattr(self, "_backbone", None)] if m is not None]
        paths: List[str] = []
        for m in mods:
            paths.extend(getattr(m, "no_weight_decay", lambda: [])())
        return paths

    # ------------------------------------------------------------------
    def dataloaders(self, phase: Phase) -> List[DataLoader]:
        return self._constructor.create_dataloaders(phase)

    def train_dataloader(self) -> List[DataLoader]:
        return self.dataloaders(Phase.TRAIN)

    def val_dataloader(self) -> List[DataLoader]:
        return self.dataloaders(Phase.VALID)

    def test_dataloader(self) -> List[DataLoader]:
        return self.dataloaders(Phase.TEST)

    def predict_dataloader(self) -> List[DataLoader]:
        return self.dataloaders(Phase.PREDICT)

    # ------------------------------------------------------------------
    def on_fit_start(self, variables):
        """Partial checkpoint load (reference tasks/base.py:113-123)."""
        lc = self._hparams.task.get("load_checkpoint")
        if lc:
            from torchok_tpu.constructor.load import load_checkpoint
            variables = load_checkpoint(
                variables,
                base_ckpt_path=lc.get("base_ckpt_path"),
                overridden_name2ckpt_path=lc.get("overridden_name2ckpt_path"),
                exclude_keys=lc.get("exclude_keys"),
                strict=lc.get("strict", True),
            )
        return variables

    def compute_loss(self, outputs: Dict[str, Any]):
        """Map step outputs to the joint loss. Detection tasks override this
        to route through the head (control inversion, reference
        detection.py:130-140)."""
        if self.losses is None:
            return jnp.zeros(()), {}
        return self.losses(**outputs)

    def as_module(self) -> nn.Module:
        """Pure-forward module for export (abstract in reference base.py:201)."""
        raise NotImplementedError

    @property
    def compute_loss_on_valid(self) -> bool:
        return bool(self._hparams.task.get("compute_loss_on_valid", True))
