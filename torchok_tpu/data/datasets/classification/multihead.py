"""Multi-head targets dataset (reference:
torchok/data/datasets/classification/multihead.py:16-136).

Each head declares ``(name, column, target_type)`` where target_type is
``multiclass`` | ``multilabel`` | ``embedding`` (path to an .npy file).
Sample keys follow the reference convention ``target_<head_name>``.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import pandas as pd

from torchok_tpu.constructor import DATASETS
from torchok_tpu.data.datasets.base import ImageDataset
from torchok_tpu.data.datasets.classification.classification import (
    process_multiclass, process_multilabel,
)


@DATASETS.register_class
class MultiHeadImageDataset(ImageDataset):
    def __init__(self, data_folder: str, annotation_path: str, targets: Sequence[Dict],
                 transform, augment=None, input_column: str = "image_path",
                 input_dtype: str = "float32", reader_library: str = "opencv",
                 image_format: str = "rgb",
                 rgba_layout_color: Union[int, Tuple[int, int, int]] = 0,
                 test_mode: bool = False, lazy_init: bool = False):
        super().__init__(transform=transform, augment=augment, input_dtype=input_dtype,
                         reader_library=reader_library, image_format=image_format,
                         rgba_layout_color=rgba_layout_color, test_mode=test_mode)
        self.data_folder = Path(data_folder)
        self.input_column = input_column
        self.heads = [dict(t) for t in targets]
        self.lazy_init = lazy_init

        path = self.data_folder / annotation_path
        self.df = pd.read_csv(path) if str(path).endswith(".csv") else pd.read_pickle(path)

        if not test_mode and not lazy_init:
            self._cached = {h["name"]: [self._head_target(h, i) for i in range(len(self.df))]
                            for h in self.heads}
        else:
            self._cached = None

    def _head_target(self, head: Dict, idx: int):
        value = self.df.iloc[idx][head["column"]]
        ttype = head.get("target_type", "multiclass")
        if ttype == "multiclass":
            return np.int64(process_multiclass(value, head.get("num_classes")))
        if ttype == "multilabel":
            return process_multilabel(value, head["num_classes"])
        if ttype == "embedding":
            return np.load(self.data_folder / value).astype(np.float32)
        raise ValueError(f"Unknown target_type {ttype!r}")

    def __len__(self) -> int:
        return len(self.df)

    def _targets_for(self, idx: int) -> Dict[str, Any]:
        out = {}
        for h in self.heads:
            name = h["name"]
            if self._cached is not None:
                out[f"target_{name}"] = self._cached[name][idx]
            else:
                out[f"target_{name}"] = self._head_target(h, idx)
        return out

    def get_raw(self, idx: int) -> dict:
        image = self._read_image(str(self.data_folder / self.df.iloc[idx][self.input_column]))
        sample = {"image": image, "index": idx}
        sample = self._apply_transform(self.augment, sample)
        if not self.test_mode:
            sample.update(self._targets_for(idx))
        return sample

    def __getitem__(self, idx: int) -> dict:
        image = self._read_image(str(self.data_folder / self.df.iloc[idx][self.input_column]))
        sample = {"image": image}
        sample = self.apply_host_pipeline(sample)
        out = {"image": sample["image"], "index": idx}
        if not self.test_mode:
            out.update(self._targets_for(idx))
        return out
