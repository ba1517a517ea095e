"""SimCLRTask (reference: torchok/tasks/simclr_task.py:9-82): two augmented
views -> emb1/emb2 for NT-Xent."""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import TASKS
from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.tasks.classification import ClassificationTask, ClassificationModel


class SimCLRModel(nn.Module):
    inner: ClassificationModel

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False) -> Dict[str, Any]:
        from torchok_tpu.tasks.classification import forward_aux_keys
        return forward_aux_keys(batch, {
            "emb1": self.inner.forward(batch["image_0"]),
            "emb2": self.inner.forward(batch["image_1"]),
        })

    def forward(self, image: jnp.ndarray) -> jnp.ndarray:
        return self.inner.forward(image)


@TASKS.register_class
class SimCLRTask(ClassificationTask):
    def __init__(self, hparams: ConfigNode, backbone_name: str,
                 pooling_name: Optional[str] = None, head_name: Optional[str] = None,
                 neck_name: Optional[str] = None, backbone_params: Optional[dict] = None,
                 neck_params: Optional[dict] = None, pooling_params: Optional[dict] = None,
                 head_params: Optional[dict] = None, inputs: Optional[list] = None,
                 **kwargs):
        super().__init__(hparams, backbone_name, pooling_name, neck_name, head_name,
                         backbone_params, neck_params, pooling_params, head_params,
                         inputs, **kwargs)
        self.model = SimCLRModel(inner=self.model)

    def example_batch(self, batch_size: int = 2) -> Dict[str, jnp.ndarray]:
        image = jnp.zeros((batch_size, *self.input_shapes[0]), self.compute_dtype)
        return {"image_0": image, "image_1": image}

    def as_module(self) -> nn.Module:
        return self.model.inner
