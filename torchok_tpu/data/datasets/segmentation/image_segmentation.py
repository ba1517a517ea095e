"""Image + mask segmentation dataset (reference:
torchok/data/datasets/segmentation/image_segmentation.py — image/mask pairs
through shared transform targets)."""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple, Union

import cv2
import numpy as np
import pandas as pd

from torchok_tpu.constructor import DATASETS
from torchok_tpu.data.datasets.base import ImageDataset


@DATASETS.register_class
class ImageSegmentationDataset(ImageDataset):
    def __init__(self, data_folder: str, annotation_path: str, transform,
                 augment=None, input_column: str = "image_path",
                 target_column: str = "mask_path", input_dtype: str = "float32",
                 target_dtype: str = "int64", reader_library: str = "opencv",
                 image_format: str = "rgb",
                 rgba_layout_color: Union[int, Tuple[int, int, int]] = 0,
                 test_mode: bool = False):
        super().__init__(transform=transform, augment=augment, input_dtype=input_dtype,
                         reader_library=reader_library, image_format=image_format,
                         rgba_layout_color=rgba_layout_color, test_mode=test_mode)
        self.data_folder = Path(data_folder)
        self.input_column = input_column
        self.target_column = target_column
        self.target_dtype = np.dtype(target_dtype)
        path = self.data_folder / annotation_path
        self.df = pd.read_csv(path) if str(path).endswith(".csv") else pd.read_pickle(path)

    def __len__(self) -> int:
        return len(self.df)

    def _read_mask(self, idx: int) -> np.ndarray:
        rel = self.df.iloc[idx][self.target_column]
        mask = cv2.imread(str(self.data_folder / rel), cv2.IMREAD_GRAYSCALE)
        if mask is None:
            raise ValueError(f"{rel} mask does not exist")
        return mask

    def get_raw(self, idx: int) -> dict:
        sample = {"image": self._image(idx), "index": idx}
        if not self.test_mode:
            sample["mask"] = self._read_mask(idx)
        return self._apply_transform(self.augment, sample)

    def _image(self, idx: int) -> np.ndarray:
        rel = self.df.iloc[idx][self.input_column]
        return self._read_image(str(self.data_folder / rel))

    def __getitem__(self, idx: int) -> dict:
        sample = {"image": self._image(idx)}
        if not self.test_mode:
            sample["mask"] = self._read_mask(idx)
        sample = self.apply_host_pipeline(sample)
        out = {"image": sample["image"], "index": idx}
        if not self.test_mode:
            out["target"] = sample["mask"].astype(self.target_dtype)
        return out
