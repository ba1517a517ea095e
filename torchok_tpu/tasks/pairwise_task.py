"""PairwiseLearnTask (reference: torchok/tasks/pairwise_task.py:11-107).

Metric learning with pairwise losses: single forward emits emb1 == emb2 and
the binary relevance matrix R computed from (multi)labels — one one-hot
scatter + matmul, MXU-native.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from torchok_tpu.constructor import TASKS
from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.tasks.classification import ClassificationTask, ClassificationModel


def calc_relevance_matrix(y: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Binary relevance matrix from a label vector or multihot matrix
    (reference pairwise_task.py:88-107)."""
    if y.ndim == 1:
        y = jax.nn.one_hot(y, num_classes, dtype=jnp.float32)
    y = y.astype(jnp.float32)
    intersections = y @ y.T
    return (intersections > 0).astype(jnp.float32)


class PairwiseModel(nn.Module):
    inner: ClassificationModel
    num_classes: int = 0

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False) -> Dict[str, Any]:
        image = batch["image"]
        target = batch.get("target")
        embedding = self.inner.forward(image)
        output = {"emb1": embedding, "emb2": embedding}
        if target is not None:
            output["R"] = calc_relevance_matrix(target, self.num_classes)
            output["target"] = target
        # retrieval metrics consume plain embeddings too
        output["embeddings"] = embedding
        from torchok_tpu.tasks.classification import forward_aux_keys
        return forward_aux_keys(batch, output)

    def forward(self, image: jnp.ndarray) -> jnp.ndarray:
        return self.inner.forward(image)


@TASKS.register_class
class PairwiseLearnTask(ClassificationTask):
    def __init__(self, hparams: ConfigNode, num_classes: int, backbone_name: str,
                 pooling_name: Optional[str] = None, head_name: Optional[str] = None,
                 neck_name: Optional[str] = None, backbone_params: Optional[dict] = None,
                 neck_params: Optional[dict] = None, pooling_params: Optional[dict] = None,
                 head_params: Optional[dict] = None, inputs: Optional[list] = None,
                 **kwargs):
        super().__init__(hparams, backbone_name, pooling_name, neck_name, head_name,
                         backbone_params, neck_params, pooling_params, head_params,
                         inputs, **kwargs)
        self.num_classes = num_classes
        self.model = PairwiseModel(inner=self.model, num_classes=num_classes)

    def as_module(self) -> nn.Module:
        return self.model.inner
