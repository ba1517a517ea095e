"""TripletLearnTask (reference: torchok/tasks/triplet_task.py:11-50):
anchor/positive/negative triple forward in train; classification-style
forward on validation batches (which carry `image`/`target`)."""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import TASKS
from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.tasks.classification import ClassificationTask, ClassificationModel


class TripletModel(nn.Module):
    inner: ClassificationModel

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False) -> Dict[str, Any]:
        if "anchor" in batch:
            return {
                "anchor": self.inner.forward(batch["anchor"]),
                "positive": self.inner.forward(batch["positive"]),
                "negative": self.inner.forward(batch["negative"]),
            }
        # validation: classification-style forward (reference triplet_task.py:38-50)
        return self.inner(batch, train=train)

    def forward(self, image: jnp.ndarray) -> jnp.ndarray:
        return self.inner.forward(image)


@TASKS.register_class
class TripletLearnTask(ClassificationTask):
    def __init__(self, hparams: ConfigNode, **kwargs):
        super().__init__(hparams, **kwargs)
        self.model = TripletModel(inner=self.model)

    def example_batch(self, batch_size: int = 2) -> Dict[str, jnp.ndarray]:
        image = jnp.zeros((batch_size, *self.input_shapes[0]), self.compute_dtype)
        return {"anchor": image, "positive": image, "negative": image}

    def as_module(self) -> nn.Module:
        return self.model.inner
