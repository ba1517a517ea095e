"""Synthetic classification dataset for benchmarks and offline smoke runs
(no reference equivalent; used where the reference CI would download data)."""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from torchok_tpu.constructor import DATASETS
from torchok_tpu.data.datasets.base import ImageDataset


@DATASETS.register_class
class SyntheticClassificationDataset(ImageDataset):
    uniform_image_size = True  # fixed-size in-memory arrays: device-resize +
                               # vectorized batch fetch apply

    def __init__(self, transform, augment=None, num_samples: int = 10000,
                 image_size: Tuple[int, int] = (32, 32), channels: int = 3,
                 num_classes: int = 10, input_dtype: str = "float32",
                 test_mode: bool = False, seed: int = 0, **kwargs):
        super().__init__(transform=transform, augment=augment,
                         input_dtype=input_dtype, test_mode=test_mode)
        rng = np.random.default_rng(seed)
        self.images = rng.integers(0, 256, size=(num_samples, *image_size, channels),
                                   dtype=np.uint8)
        self.targets = rng.integers(0, num_classes, size=(num_samples,)).astype(np.int64)

    def __len__(self) -> int:
        return len(self.images)

    def get_batch(self, idxs):
        """Vectorized batch fetch (numpy fancy-index, no per-sample python).
        Used by the loader when the host transform prefix is empty."""
        out = {"image": self.images[idxs], "index": idxs.astype("int64")}
        if not self.test_mode:
            out["target"] = self.targets[idxs]
        return out

    def get_raw(self, idx: int) -> dict:
        sample = {"image": self.images[idx], "index": idx}
        sample = self._apply_transform(self.augment, sample)
        if not self.test_mode:
            sample["target"] = int(self.targets[idx])
        return sample

    def __getitem__(self, idx: int) -> dict:
        sample = {"image": self.images[idx]}
        sample = self.apply_host_pipeline(sample)
        out = {"image": sample["image"], "index": idx}
        if not self.test_mode:
            out["target"] = self.targets[idx]
        return out
