"""Unsupervised contrastive dataset (reference:
torchok/data/datasets/representation/unsupervised_contrastive_dataset.py):
the same image through two independent augment draws -> image_0 / image_1.
"""
from __future__ import annotations

import warnings
from pathlib import Path
from typing import Optional, Tuple, Union

import pandas as pd

from torchok_tpu.constructor import DATASETS
from torchok_tpu.data.datasets.base import ImageDataset


@DATASETS.register_class
class UnsupervisedContrastiveDataset(ImageDataset):
    def __init__(self, data_folder: str, transform, augment=None,
                 annotation_path: Optional[str] = None,
                 input_column: str = "image_path", input_dtype: str = "float32",
                 reader_library: str = "opencv", image_format: str = "rgb",
                 rgba_layout_color: Union[int, Tuple[int, int, int]] = 0,
                 csv_path: Optional[str] = None):
        if annotation_path is None:
            if csv_path is not None:
                warnings.warn("`csv_path` is deprecated; use annotation_path instead.")
                annotation_path = csv_path
            else:
                raise ValueError("`annotation_path` must be specified.")
        super().__init__(transform=transform, augment=augment, input_dtype=input_dtype,
                         reader_library=reader_library, image_format=image_format,
                         rgba_layout_color=rgba_layout_color)
        self.data_folder = Path(data_folder)
        self.input_column = input_column
        path = self.data_folder / annotation_path
        self.df = pd.read_csv(path) if str(path).endswith(".csv") else pd.read_pickle(path)

    def __len__(self) -> int:
        return len(self.df)

    def _image(self, idx: int):
        return self._read_image(str(self.data_folder / self.df.iloc[idx][self.input_column]))

    def get_raw(self, idx: int) -> dict:
        image = self._image(idx)
        s0 = self._apply_transform(self.augment, {"image": image})
        s1 = self._apply_transform(self.augment, {"image": image})
        return {"image_0": s0["image"], "image_1": s1["image"], "index": idx}

    def __getitem__(self, idx: int) -> dict:
        image = self._image(idx)
        # two independent draws through the host pipeline; the on-device
        # suffix adds further independent per-sample randomness per view
        s0 = self.apply_host_pipeline({"image": image})
        s1 = self.apply_host_pipeline({"image": image})
        return {"image_0": s0["image"], "image_1": s1["image"], "index": idx}
