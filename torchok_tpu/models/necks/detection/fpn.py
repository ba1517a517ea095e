"""Feature Pyramid Network neck (reference: torchok/models/necks/detection/fpn.py
— an mmdet FPN subclass; rebuilt natively in Flax NHWC).

Laterals (1x1) + top-down nearest-upsample additions + 3x3 output convs,
with optional extra levels from stride-2 convs on the last input/output
(`add_extra_convs`) or max-pool."""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from torchok_tpu.constructor import DETECTION_NECKS, NECKS
from torchok_tpu.models.base import BaseModel
from torchok_tpu.ops.image import max_pool, resize_nearest


@DETECTION_NECKS.register_class
class FPN(BaseModel):
    in_channels: Tuple[int, ...] = ()
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: Union[bool, str] = False  # False|'on_input'|'on_lateral'|'on_output'
    relu_before_extra_convs: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        end = len(self.in_channels) if self.end_level == -1 else self.end_level
        used = list(inputs[self.start_level:end])

        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(x)
            for i, x in enumerate(used)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = resize_nearest(laterals[i], (laterals[i - 1].shape[1],
                                              laterals[i - 1].shape[2]))
            laterals[i - 1] = laterals[i - 1] + up

        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f"fpn_conv_{i}")(laterals[i])
            for i in range(len(laterals))
        ]

        extra_src = {
            "on_input": lambda: used[-1],
            "on_lateral": lambda: laterals[-1],
            "on_output": lambda: outs[-1],
        }
        if self.num_outs > len(outs):
            if not self.add_extra_convs:  # extra max-pool levels
                for _ in range(self.num_outs - len(outs)):
                    outs.append(max_pool(outs[-1], window=1, stride=2, padding=0))
            else:
                mode = self.add_extra_convs if isinstance(self.add_extra_convs, str) \
                    else "on_input"
                x = extra_src[mode]()
                for i in range(self.num_outs - len(outs)):
                    if i > 0 and self.relu_before_extra_convs:
                        x = nn.relu(x)
                    x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)), dtype=self.dtype,
                                name=f"extra_conv_{i}")(x)
                    outs.append(x)
        return outs


NECKS.register_class(FPN, name="FPNNeck")
