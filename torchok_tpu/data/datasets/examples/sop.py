"""Stanford Online Products datasets (reference:
torchok/data/datasets/examples/sop.py, triplet_sop.py). Same archive URL and
md5; download is gated for offline environments."""
from __future__ import annotations

import tarfile
import urllib.request
from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np
import pandas as pd

from torchok_tpu.constructor import DATASETS
from torchok_tpu.data.datasets.base import ImageDataset
from torchok_tpu.data.datasets.examples.cifar import check_integrity


class _SOPBase(ImageDataset):
    base_folder = "Stanford_Online_Products"
    url = "https://torchok-hub.s3.eu-west-1.amazonaws.com/Stanford_Online_Products.tar.gz"
    filename = "Stanford_Online_Products.tar.gz"
    tgz_md5 = "b96128cf2b75493708511ff5c400eefe"

    def _download(self) -> None:
        if self.path.is_dir():
            return
        self.data_folder.mkdir(parents=True, exist_ok=True)
        archive = self.data_folder / self.filename
        if not check_integrity(archive, self.tgz_md5):
            urllib.request.urlretrieve(self.url, archive)  # noqa: S310
        with tarfile.open(archive, "r:gz") as tar:
            tar.extractall(self.data_folder)


@DATASETS.register_class
class SOP(_SOPBase):
    """120,053 images / 22,634 product classes; train 59,551 / test 60,502.
    Train labels start at 1, test labels at 11319 (both rebased to 0)."""

    train_txt = "Ebay_train.txt"
    test_txt = "Ebay_test.txt"

    def __init__(self, train: bool, download: bool, data_folder: str, transform,
                 augment=None, input_dtype: str = "float32",
                 reader_library: str = "opencv", image_format: str = "rgb",
                 rgba_layout_color: Union[int, Tuple[int, int, int]] = 0,
                 test_mode: bool = False):
        super().__init__(transform=transform, augment=augment, input_dtype=input_dtype,
                         reader_library=reader_library, image_format=image_format,
                         rgba_layout_color=rgba_layout_color, test_mode=test_mode)
        self.data_folder = Path(data_folder)
        self.path = self.data_folder / self.base_folder
        self.train = train
        if download:
            self._download()
        if not self.path.is_dir():
            raise RuntimeError("Dataset not found or corrupted. You can use download=True to download it")
        txt = self.train_txt if train else self.test_txt
        self.csv = pd.read_csv(self.path / txt, sep=" ")
        self.target_column = "class_id"
        self.path_column = "path"
        self.label_offset = 1 if train else 11319

    def __len__(self) -> int:
        return len(self.csv)

    def _target(self, idx: int) -> int:
        return int(self.csv.iloc[idx][self.target_column]) - self.label_offset

    def get_raw(self, idx: int) -> dict:
        record = self.csv.iloc[idx]
        image = self._read_image(str(self.path / record[self.path_column]))
        sample = {"image": image, "index": idx}
        if not self.test_mode:
            sample["target"] = self._target(idx)
        return self._apply_transform(self.augment, sample)

    def __getitem__(self, idx: int) -> dict:
        record = self.csv.iloc[idx]
        image = self._read_image(str(self.path / record[self.path_column]))
        sample = self.apply_host_pipeline({"image": image})
        out = {"image": sample["image"], "index": idx}
        if not self.test_mode:
            out["target"] = np.int64(self._target(idx))
        return out


@DATASETS.register_class
class TRIPLET_SOP(_SOPBase):
    """11,319 (anchor, positive, negative) triplets over SOP."""

    triplets_txt = "Ebay_triplets.txt"

    def __init__(self, download: bool, data_folder: str, transform, augment=None,
                 anchor_column: str = "anchor", positive_column: str = "positive",
                 negative_column: str = "negative", input_dtype: str = "float32",
                 reader_library: str = "opencv", image_format: str = "rgb",
                 rgba_layout_color: Union[int, Tuple[int, int, int]] = 0,
                 test_mode: bool = False):
        super().__init__(transform=transform, augment=augment, input_dtype=input_dtype,
                         reader_library=reader_library, image_format=image_format,
                         rgba_layout_color=rgba_layout_color, test_mode=test_mode)
        self.data_folder = Path(data_folder)
        self.path = self.data_folder / self.base_folder
        if download:
            self._download()
        if not self.path.is_dir():
            raise RuntimeError("Dataset not found or corrupted. You can use download=True to download it")
        self.csv = pd.read_csv(self.path / self.triplets_txt, sep=" ")
        self.anchor_column = anchor_column
        self.positive_column = positive_column
        self.negative_column = negative_column

    def __len__(self) -> int:
        return len(self.csv)

    def _prep(self, idx: int, column: str):
        record = self.csv.iloc[idx]
        image = self._read_image(str(self.path / record[column]))
        return self.apply_host_pipeline({"image": image})["image"]

    def get_raw(self, idx: int) -> dict:
        record = self.csv.iloc[idx]
        out = {"index": idx}
        for key, col in (("anchor", self.anchor_column),
                         ("positive", self.positive_column),
                         ("negative", self.negative_column)):
            image = self._read_image(str(self.path / record[col]))
            out[key] = self._apply_transform(self.augment, {"image": image})["image"]
        return out

    def __getitem__(self, idx: int) -> dict:
        return {"anchor": self._prep(idx, self.anchor_column),
                "positive": self._prep(idx, self.positive_column),
                "negative": self._prep(idx, self.negative_column),
                "index": idx}
