"""Base model contracts.

TPU-native re-design of the reference model contracts (reference:
torchok/models/base.py:8-63, torchok/models/backbones/base_backbone.py:11-64).

Models are Flax linen modules. Differences from the torch design, by intent:

* ``forward_features`` returns the ``[input] + per-stage`` feature pyramid
  explicitly — no forward hooks (a PyTorch-ism); intermediates are returned
  as values, which is the idiomatic functional/JAX formulation and lets XLA
  DCE unused stages.
* ``get_stages`` returns *parameter-path prefixes* instead of submodules;
  freezing is expressed as optax masks over those prefixes rather than
  ``requires_grad`` mutation.
* All image tensors are NHWC (TPU-native layout). The YAML surface still
  speaks CHW shapes for input specs; conversion happens at the task boundary.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class BaseModel(nn.Module):
    """Contract: every model declares its input/output channel arity.

    Subclasses must provide ``in_channels`` (constructor field or property)
    and ``out_channels`` so the constructor can auto-wire stage boundaries
    (backbone -> neck -> pooling -> head) from config alone.
    """

    def no_weight_decay(self) -> List[str]:
        """Parameter-path substrings excluded from weight decay."""
        return []


class BaseBackbone(BaseModel):
    """Backbone contract: staged feature extractor.

    ``__call__(x, train)``            -> final (deepest) feature map, NHWC.
    ``forward_features(x, train)``    -> ``[input, stem_or_stage1, ...]`` list.
    ``out_encoder_channels``          -> channels of each pyramid entry after
                                         the input (shallow -> deep).
    ``get_stages(stage)``             -> parameter-path prefixes covering the
                                         stem plus the first ``stage`` stages,
                                         used to build freeze masks.
    """

    @property
    def out_encoder_channels(self) -> Tuple[int, ...]:
        raise NotImplementedError

    def forward_features(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        raise NotImplementedError

    def get_stages(self, stage: int) -> List[str]:
        raise NotImplementedError


class BackboneWrapper(nn.Module):
    """Adapter exposing a backbone's feature pyramid as a plain ``__call__``
    (used when exporting tasks whose neck consumes ``forward_features``)."""
    backbone: BaseBackbone

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        return self.backbone.forward_features(x, train=train)


def normalize_shape(shape: Sequence[int]) -> Tuple[int, ...]:
    return tuple(int(s) for s in shape)


def chw_to_nhwc_shape(shape: Sequence[int]) -> Tuple[int, ...]:
    """Convert a config CHW shape spec (reference layout) to HWC."""
    shape = normalize_shape(shape)
    if len(shape) == 3:
        c, h, w = shape
        return (h, w, c)
    return shape
