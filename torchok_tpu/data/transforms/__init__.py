"""Transform registry + device pipeline assembly."""
from typing import Any, Dict, List, Optional

import jax

from torchok_tpu.data.transforms.base import (
    BaseTransform, Compose, OneOf, SomeOf, Sequential, NoOp,
)
import torchok_tpu.data.transforms.spatial  # noqa: F401
import torchok_tpu.data.transforms.pixelwise  # noqa: F401


class DeviceTransformPipeline:
    """Jit-traceable batched application of device-capable transforms.

    The engine folds the step key per transform so each op draws independent
    per-sample randomness.
    """

    def __init__(self, transforms: List[BaseTransform]):
        self.transforms = list(transforms)

    def __bool__(self) -> bool:
        return bool(self.transforms)

    def __call__(self, batch: Dict[str, Any], rng) -> Dict[str, Any]:
        for i, t in enumerate(self.transforms):
            batch = t.apply_batch(batch, jax.random.fold_in(rng, i))
        return batch
