"""Weighted random sampler driven by an annotation csv column
(reference: torchok/data/samplers/weighted_sampler.py:10-45)."""
from __future__ import annotations

from pathlib import Path
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from torchok_tpu.constructor import SAMPLERS


@SAMPLERS.register_class
class WeightedSampler:
    def __init__(self, annotation_path: str, weight_column: str = "weight",
                 num_samples: Optional[int] = None, replacement: bool = True,
                 data_folder: Optional[str] = None, seed: int = 0, **_):
        path = Path(data_folder) / annotation_path if data_folder else Path(annotation_path)
        if str(path).endswith(".csv"):
            df = pd.read_csv(path)
        else:
            df = pd.read_pickle(path)
        weights = df[weight_column].to_numpy(dtype=np.float64)
        self.probs = weights / weights.sum()
        self.num_samples = num_samples or len(weights)
        self.replacement = replacement
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return self.num_samples

    def __iter__(self) -> Iterator[int]:
        idxs = self.rng.choice(len(self.probs), size=self.num_samples,
                               replace=self.replacement, p=self.probs)
        return iter(idxs.tolist())
