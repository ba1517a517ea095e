"""ArcFace additive-angular-margin head
(reference: torchok/models/heads/classification/arcface_head.py:13-135).

TPU-native formulation: the dynamic-margin warmup step counter is a flax
variable in the ``buffers`` collection (mutable inside the jitted train step)
and the margin schedule is computed in-graph with ``jnp`` so the whole head
stays traceable — the reference's mutable python-side buffer would break
under jit (SURVEY.md §7 "hard parts").
"""
from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import HEADS
from torchok_tpu.models.base import BaseModel


@HEADS.register_class
class ArcFaceHead(BaseModel):
    in_channels: int = 0
    num_classes: int = 0
    scale: Optional[float] = None
    margin: Optional[float] = None
    easy_margin: bool = False
    dynamic_margin: bool = False
    num_warmup_steps: Optional[int] = None
    min_margin: Optional[float] = None
    dtype: Any = None

    @property
    def out_channels(self) -> int:
        return self.num_classes

    def _default_scale(self) -> float:
        p = 0.999
        c1 = self.num_classes - 1
        return c1 / self.num_classes * math.log(c1 * p / (1 - p)) + 1

    def _default_margin(self) -> float:
        if self.in_channels == 2:
            return 0.9 - math.cos(2 * math.pi / self.num_classes)
        return 0.5 * self.num_classes / (self.num_classes - 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray, target: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        if self.dynamic_margin:
            if not isinstance(self.num_warmup_steps, int) or self.num_warmup_steps <= 0:
                raise ValueError("`num_warmup_steps` must be positive int when `dynamic_margin` is True")
            if self.min_margin is None:
                raise ValueError("`min_margin` must be float when `dynamic_margin` is True")

        weight = self.param(
            "weight", nn.initializers.xavier_uniform(),
            (self.num_classes, self.in_channels),
        )

        if not train:
            # eval mode = plain linear logits (reference arcface_head.py:120-121)
            return x @ weight.T

        if target is None:
            raise ValueError("Target is None in training mode.")

        scale = self.scale if self.scale is not None else self._default_scale()
        max_margin = self.margin if self.margin is not None else self._default_margin()

        step = self.variable("buffers", "step", lambda: jnp.zeros((), jnp.int32))
        if self.dynamic_margin:
            frac = jnp.clip(step.value / self.num_warmup_steps, 0.0, 1.0)
            margin = self.min_margin + frac * (max_margin - self.min_margin)
            step.value = step.value + 1
        else:
            margin = jnp.asarray(max_margin, jnp.float32)

        cos_m, sin_m = jnp.cos(margin), jnp.sin(margin)
        th = jnp.cos(jnp.pi - margin)
        mm = jnp.sin(jnp.pi - margin) * margin

        xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        wn = weight / (jnp.linalg.norm(weight, axis=-1, keepdims=True) + 1e-12)
        cosine = (xn @ wn.T).astype(jnp.float32)
        sine = jnp.sqrt(jnp.clip(1.0 - cosine ** 2, 0.0, 1.0))
        phi = cosine * cos_m - sine * sin_m
        if self.easy_margin:
            phi = jnp.where(cosine > 0, phi, cosine)
        else:
            phi = jnp.where(cosine > th, phi, cosine - mm)

        one_hot = jnp.arange(self.num_classes)[None, :] == target.reshape(-1, 1)
        output = jnp.where(one_hot, phi, cosine) * scale
        return output.astype(x.dtype)
