"""Generic multiclass/multilabel image classification dataset
(reference: torchok/data/datasets/classification/classification.py:43-209).

Annotation files are .csv or .pkl (pandas) with image paths under
``input_column`` and labels under ``target_column``; multilabel targets are
space/comma-separated class-index strings converted to multihot.
"""
from __future__ import annotations

import re
import warnings
from pathlib import Path
from typing import Any, Optional, Tuple, Union

import numpy as np
import pandas as pd

from torchok_tpu.constructor import DATASETS
from torchok_tpu.data.datasets.base import ImageDataset, resolve_np_dtype


def process_multilabel(labels: Union[str, int], num_classes: int) -> np.ndarray:
    """Convert a separated class-index string into a multihot vector."""
    labels = list(map(int, re.findall(r"\d+", str(labels))))
    max_label = max(labels)
    if max_label >= num_classes:
        raise ValueError(
            f"Target column contains label: {max_label}, it's more than num_classes = {num_classes}"
        )
    multihot = np.zeros((num_classes,), dtype=bool)
    multihot[labels] = True
    return multihot


def process_multiclass(label: Any, num_classes: Optional[int]) -> int:
    label = int(label)
    if num_classes is not None and label >= num_classes:
        raise ValueError(
            f"Target column contains label: {label}, it's more than num_classes = {num_classes}"
        )
    return label


@DATASETS.register_class
class ImageClassificationDataset(ImageDataset):
    def __init__(self,
                 data_folder: str,
                 transform,
                 augment=None,
                 annotation_path: Optional[str] = None,
                 num_classes: Optional[int] = None,
                 input_column: str = "image_path",
                 input_dtype: str = "float32",
                 target_column: str = "label",
                 target_dtype: str = "long",
                 reader_library: str = "opencv",
                 image_format: str = "rgb",
                 rgba_layout_color: Union[int, Tuple[int, int, int]] = 0,
                 test_mode: bool = False,
                 multilabel: bool = False,
                 lazy_init: bool = False,
                 csv_path: Optional[str] = None):
        if annotation_path is None:
            if csv_path is not None:
                warnings.warn("`csv_path` is deprecated; use annotation_path instead.")
                annotation_path = csv_path
            else:
                raise ValueError("`annotation_path` must be specified.")
        super().__init__(transform=transform, augment=augment, input_dtype=input_dtype,
                         reader_library=reader_library, image_format=image_format,
                         rgba_layout_color=rgba_layout_color, test_mode=test_mode)
        self.data_folder = Path(data_folder)
        self.annotation_path = annotation_path
        self.num_classes = num_classes
        self.input_column = input_column
        self.target_column = target_column
        self.target_dtype = target_dtype
        self.multilabel = multilabel
        self.lazy_init = lazy_init

        path = self.data_folder / annotation_path
        if str(annotation_path).endswith(".csv"):
            self.df = pd.read_csv(path)
        else:
            self.df = pd.read_pickle(path)

        if not test_mode and not lazy_init:
            if multilabel:
                if num_classes is None:
                    raise ValueError("num_classes is required for multilabel targets")
                self._targets = np.stack([
                    process_multilabel(v, num_classes) for v in self.df[target_column]
                ])
            else:
                self._targets = np.array([
                    process_multiclass(v, num_classes) for v in self.df[target_column]
                ], dtype=np.int64)
        else:
            self._targets = None

    def __len__(self) -> int:
        return len(self.df)

    def _target(self, idx: int):
        if self._targets is not None:
            return self._targets[idx]
        value = self.df.iloc[idx][self.target_column]
        if self.multilabel:
            return process_multilabel(value, self.num_classes)
        return process_multiclass(value, self.num_classes)

    def _image(self, idx: int) -> np.ndarray:
        rel = self.df.iloc[idx][self.input_column]
        return self._read_image(str(self.data_folder / rel))

    def get_raw(self, idx: int) -> dict:
        sample = {"image": self._image(idx), "index": idx}
        sample = self._apply_transform(self.augment, sample)
        if not self.test_mode:
            sample["target"] = self._target(idx)
        return sample

    def __getitem__(self, idx: int) -> dict:
        sample = {"image": self._image(idx)}
        sample = self.apply_host_pipeline(sample)
        out = {"image": sample["image"], "index": idx}
        if not self.test_mode:
            target = self._target(idx)
            out["target"] = np.asarray(target, dtype=resolve_np_dtype(self.target_dtype))
        return out
