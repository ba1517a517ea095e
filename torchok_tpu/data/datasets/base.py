"""ImageDataset ABC (reference: torchok/data/datasets/base.py:16-170).

TPU-native pipeline split: the reference runs the whole augment+transform
chain per-sample on CPU workers; here the combined chain is cut at the
maximal *device-capable suffix* — the host prefix (decode, geometry) runs
per-sample in loader threads, the suffix (normalize, flips, photometric
jitter) runs batched on-TPU (see data/transforms). ``__getitem__`` therefore
returns host-stage numpy samples; the loader applies the device stage after
collation and sharding.
"""
from __future__ import annotations

import warnings
from abc import ABC, abstractmethod
from typing import Any, Dict, List, Optional, Tuple, Union

import cv2
import numpy as np
from PIL import Image
from PIL.Image import open as imopen

from torchok_tpu.data.transforms import Compose, DeviceTransformPipeline
from torchok_tpu.data.transforms.base import BaseTransform

Image.MAX_IMAGE_PIXELS = 933120000

_DTYPES = {
    "float32": np.float32,
    "float16": np.float16,
    "bfloat16": np.float32,  # collated on host as f32; cast to bf16 on device
    "float64": np.float64,
    "uint8": np.uint8,
    "long": np.int64,
    "int64": np.int64,
    "int32": np.int32,
}


def resolve_np_dtype(name: str) -> np.dtype:
    return np.dtype(_DTYPES.get(name, name))


class ImageDataset(ABC):
    def __init__(
            self,
            transform: Optional[Union[BaseTransform, Compose, list]],
            augment: Optional[Union[BaseTransform, Compose, list]] = None,
            input_dtype: str = "float32",
            reader_library: str = "opencv",
            image_format: str = "rgb",
            rgba_layout_color: Union[int, Tuple[int, int, int]] = 0,
            test_mode: bool = False,
    ):
        self.test_mode = test_mode
        self.input_dtype = input_dtype
        self.reader_library = reader_library
        self.image_format = image_format
        self.rgba_layout_color = rgba_layout_color

        transform = self._ensure_compose(transform)
        augment = self._ensure_compose(augment)
        self.transform = transform
        self.augment = augment

        # split combined augment+transform chain into host prefix / device suffix
        combined = []
        if augment is not None:
            combined.extend(augment.transforms)
        if transform is not None:
            combined.extend(transform.transforms)
        full = Compose(combined, p=1.0)
        self._host_pipeline, device_suffix = full.split_device_suffix(
            bbox_mode=getattr(self, "has_bboxes", False),
            uniform_shapes=getattr(self, "uniform_image_size", False))
        self.device_pipeline = DeviceTransformPipeline(device_suffix)

    @property
    def host_pipeline_empty(self) -> bool:
        return not self._host_pipeline.transforms

    @staticmethod
    def _ensure_compose(t) -> Optional[Compose]:
        if t is None or isinstance(t, Compose):
            return t
        if isinstance(t, (list, tuple)):
            return Compose(list(t), p=1.0)
        return Compose([t], p=1.0)

    def seed(self, seed: int) -> None:
        """Reseed host-side transform RNGs (per worker/epoch determinism)."""
        self._host_pipeline.seed(seed)

    # ----------------------------- transforms ------------------------------
    def _apply_transform(self, transform, sample: dict) -> dict:
        if transform is None:
            return sample
        return transform(**sample)

    def apply_host_pipeline(self, sample: dict) -> dict:
        sample = self._host_pipeline(**sample)
        # Reference semantics: the final image tensor carries input_dtype
        # (reference ImageDataset casts in __getitem__). When a device suffix
        # exists the image intentionally stays uint8 on host (4x cheaper
        # host->device transfer) and the engine casts on device; when the
        # whole pipeline ran on host, apply the cast here.
        if not self.device_pipeline:
            img = sample.get("image")
            if img is not None:
                # unconditional like the reference (`.type(torch.<dtype>)`,
                # reference torchok/data/datasets/classification/
                # classification.py:183) — even uint8 pipelines cast;
                # resolve_np_dtype maps bfloat16 -> f32 for host collation
                sample["image"] = np.asarray(img).astype(
                    resolve_np_dtype(self.input_dtype))
        return sample

    # ------------------------------ reading --------------------------------
    def _read_image(self, image_path: str) -> np.ndarray:
        # first-party native decode (GIL-free libjpeg/libpng, see
        # torchok_tpu/native): JPEG -> RGB, PNG -> RGBA; falls through to the
        # configured reader for other formats or when the toolchain is absent
        if self.reader_library in ("opencv", "native"):
            from torchok_tpu import native as tk_native
            image = tk_native.decode_file(str(image_path))
            if image is not None:
                return self._convert_image_format(image)
            # cv2 fallback (non-JPEG/PNG formats or toolchain absent)
            image = cv2.imread(str(image_path), cv2.IMREAD_UNCHANGED)
            if image is None:
                raise ValueError(f"{image_path} image does not exist")
            if image.dtype != np.uint8:
                warnings.warn(f"Incorrect image dtype `{image.dtype}` for image: `{image_path}`")
                image = (image // 256).astype("uint8")
            if image.ndim == 3 and image.shape[2] == 3:
                image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
            elif image.ndim == 3 and image.shape[2] == 4:
                image = cv2.cvtColor(image, cv2.COLOR_BGRA2RGBA)
        elif self.reader_library == "pillow":
            image = np.array(imopen(image_path).convert("RGBA"))
        else:
            raise ValueError(f"Unsupported reader library format `{self.reader_library}`")
        return self._convert_image_format(image)

    def _composite_over(self, rgb: np.ndarray, alpha: np.ndarray) -> np.ndarray:
        alpha = alpha / 255.0
        out = np.clip(rgb * alpha + self.rgba_layout_color * (1 - alpha), 0, 255)
        return out.astype("uint8")

    def _convert_image_format(self, image: np.ndarray) -> np.ndarray:
        fmt = self.image_format
        if fmt == "rgb":
            if image.ndim == 2:
                image = cv2.cvtColor(image, cv2.COLOR_GRAY2RGB)
            elif image.shape[2] == 4:
                image = self._composite_over(image[..., :3], image[..., 3:4])
            elif image.shape[2] == 2:  # LA
                rgb = cv2.cvtColor(image[..., 0], cv2.COLOR_GRAY2RGB)
                image = self._composite_over(rgb, image[..., 1:2])
        elif fmt == "rgba":
            if image.ndim == 2:
                image = cv2.cvtColor(image, cv2.COLOR_GRAY2RGBA)
            elif image.shape[2] == 3:
                image = cv2.cvtColor(image, cv2.COLOR_RGB2RGBA)
            elif image.shape[2] == 2:
                rgb = cv2.cvtColor(image[..., 0], cv2.COLOR_GRAY2RGB)
                image = np.concatenate([rgb, image[..., 1:2]], axis=-1)
        elif fmt == "bgr":
            if image.ndim == 2:
                image = cv2.cvtColor(image, cv2.COLOR_GRAY2BGR)
            elif image.shape[2] == 4:
                image = self._composite_over(image[..., :3], image[..., 3:4])
                image = cv2.cvtColor(image, cv2.COLOR_RGB2BGR)
            elif image.shape[2] == 3:
                image = cv2.cvtColor(image, cv2.COLOR_RGB2BGR)
            elif image.shape[2] == 2:
                bgr = cv2.cvtColor(image[..., 0], cv2.COLOR_GRAY2BGR)
                image = self._composite_over(bgr, image[..., 1:2])
        elif fmt == "gray":
            if image.ndim == 3 and image.shape[2] == 4:
                image = self._composite_over(image[..., :3], image[..., 3:4])
            if image.ndim == 3 and image.shape[2] == 3:
                image = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
            if image.ndim == 3 and image.shape[2] == 2:
                image = image[..., 0]
            if image.ndim == 2:
                image = image[..., None]
        else:
            raise ValueError(f"Unsupported image format `{self.image_format}`")
        return image

    # ------------------------------ contract -------------------------------
    @abstractmethod
    def __len__(self) -> int:
        ...

    @abstractmethod
    def __getitem__(self, idx: int) -> dict:
        ...

    @abstractmethod
    def get_raw(self, idx: int) -> dict:
        ...
