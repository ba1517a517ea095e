"""StableHLO inference task (reference: torchok/tasks/onnx.py:16-131 — the
ONNXTask that replays an exported model through the same datasets/metrics).

Loads a .stablehlo artifact and runs test/predict through the standard
engine: the exported computation executes directly on the current backend
(TPU) with zero-copy device buffers — the equivalent of the reference's
onnxruntime io_binding path, provided natively by jax.export.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import TASKS
from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.tasks.base import BaseTask


class _ExportedModule(nn.Module):
    """Adapter presenting the exported callable through the task-module API."""
    runner: Any  # StableHLOModel (host object; not a pytree of params)
    image_key: str = "image"  # dataset-side input name (keys_mapping)

    def __call__(self, batch: Dict[str, Any], train: bool = False) -> Dict[str, Any]:
        prediction = self.runner(batch[self.image_key])
        output = {"prediction": prediction, "embeddings": prediction}
        if batch.get("target") is not None:
            output["target"] = batch["target"]
        return output

    def forward(self, image: jnp.ndarray) -> jnp.ndarray:
        return self.runner(image)


@TASKS.register_class
class StableHLOTask(BaseTask):
    def __init__(self, hparams: ConfigNode, model_path: str,
                 inputs: Optional[list] = None, image_key: str = "image",
                 **kwargs):
        super().__init__(hparams, **kwargs)
        from torchok_tpu.export.stablehlo import StableHLOModel
        self.runner = StableHLOModel(model_path)
        self.model = _ExportedModule(runner=self.runner, image_key=image_key)

    def init_variables(self, rng, batch=None):
        return {"params": {}}

    def apply_model(self, variables, batch, train, rngs=None, mutable=()):
        out = self.model(batch, train=train)
        return out, {}

    def as_module(self) -> nn.Module:
        return self.model


@TASKS.register_class(name="ONNXTask")
class ONNXTask(StableHLOTask):
    """Name-parity alias: accepts the reference ONNXTask surface
    (reference: torchok/tasks/onnx.py:16-52 — ``path_to_onnx``,
    ``providers``, ``keys_mapping_onnx2dataset``) and replays a StableHLO
    artifact instead. ``providers`` is ignored (the artifact runs on the
    current JAX backend); the key mapping's dataset-side names are honored
    for the image input."""

    def __init__(self, hparams: ConfigNode, path_to_onnx: Optional[str] = None,
                 model_path: Optional[str] = None, providers=None,
                 keys_mapping_onnx2dataset: Optional[Dict[str, str]] = None,
                 **kwargs):
        path = model_path or path_to_onnx
        if path is None:
            raise ValueError("ONNXTask requires path_to_onnx (or model_path)")
        mapping = keys_mapping_onnx2dataset
        if hasattr(mapping, "to_dict"):
            mapping = mapping.to_dict()
        self.keys_mapping = dict(mapping or {})
        # dataset-side name of the (single) model input, reference onnx.py:52
        image_key = next(iter(self.keys_mapping.values()), "image")
        super().__init__(hparams, model_path=path, image_key=image_key,
                         **kwargs)
