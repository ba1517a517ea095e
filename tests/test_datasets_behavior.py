"""Dataset behavioral tests — the reference's per-dataset matrix (shape under
transform, grayscale, augment, input_dtype, output keys, test_mode; pattern:
tests/base_tests/data/datasets/test_image_classification.py etc.), rebuilt
over generated fixtures and this framework's contract: images are HWC on
host, the device-capable transform suffix (Normalize/ToTensorV2 here) runs
batched on device, and per-sample access returns the host-prefix output.
``_full(ds, i)`` replays host prefix + device suffix for end-shape checks."""
import jax
import jax.numpy as jnp
import json

import cv2
import numpy as np
import pandas as pd
import pytest

import torchok_tpu  # noqa: F401
from torchok_tpu.constructor import DATASETS
from torchok_tpu.constructor.constructor import Constructor

_TRANSFORM_CFG = [
    {"name": "Resize", "params": {"height": 48, "width": 48}},
    {"name": "Normalize"},
    {"name": "ToTensorV2"},
]
_AUGMENT_CFG = [{"name": "HorizontalFlip", "params": {"p": 0.5}},
                {"name": "VerticalFlip", "params": {"p": 0.5}}]


def TRANSFORM():
    return Constructor._create_transforms(_TRANSFORM_CFG)


def AUGMENT():
    return Constructor._create_transforms(_AUGMENT_CFG)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    rows_mc, rows_ml, rows_seg, rows_ret, rows_det = [], [], [], [], []
    for i in range(7):
        img = rng.integers(0, 255, size=(32, 40, 3), dtype=np.uint8)
        cv2.imwrite(str(root / f"im_{i}.png"), img)
        mask = rng.integers(0, 3, size=(32, 40), dtype=np.uint8)
        cv2.imwrite(str(root / f"m_{i}.png"), mask)
        rows_mc.append({"image_path": f"im_{i}.png", "label": i % 3})
        rows_ml.append({"image_path": f"im_{i}.png",
                        "label": json.dumps([i % 3, (i + 1) % 3])})
        rows_seg.append({"image_path": f"im_{i}.png", "mask_path": f"m_{i}.png"})
    pd.DataFrame(rows_mc).to_csv(root / "mc.csv", index=False)
    pd.DataFrame(rows_ml).to_csv(root / "ml.csv", index=False)
    pd.DataFrame(rows_seg).to_csv(root / "seg.csv", index=False)
    return root


def _make(name, root, ann, **kw):
    kw.setdefault("transform", TRANSFORM())
    return DATASETS.get(name)(data_folder=str(root), annotation_path=ann, **kw)


def _full(ds, i):
    """Host prefix output + batched device suffix for one sample."""
    s = ds[i]
    batch = {k: jnp.asarray(v)[None] if isinstance(v, np.ndarray) or np.isscalar(v)
             else v for k, v in s.items()}
    batch = ds.device_pipeline(batch, jax.random.PRNGKey(0))
    return {k: np.asarray(v[0]) if hasattr(v, "ndim") and v.ndim > 0 else v
            for k, v in batch.items()}


class TestClassificationDataset:
    def test_len_and_keys(self, data_root):
        ds = _make("ImageClassificationDataset", data_root, "mc.csv")
        assert len(ds) == 7
        assert sorted(ds[0].keys()) == ["image", "index", "target"]

    def test_shape_when_transformed(self, data_root):
        ds = _make("ImageClassificationDataset", data_root, "mc.csv")
        # host prefix resizes (HWC uint8); device suffix normalizes
        assert ds[0]["image"].shape == (48, 48, 3)
        assert ds[0]["image"].dtype == np.uint8
        out = _full(ds, 0)
        assert out["image"].shape == (48, 48, 3)
        assert out["image"].dtype == np.float32
        assert abs(float(out["image"].mean())) < 3.0  # normalized

    def test_shape_when_grayscale(self, data_root):
        ds = _make("ImageClassificationDataset", data_root, "mc.csv",
                   image_format="gray")
        assert ds[0]["image"].shape == (48, 48, 1)

    def test_augment_not_none(self, data_root):
        ds = _make("ImageClassificationDataset", data_root, "mc.csv",
                   augment=AUGMENT())
        assert ds[0]["image"].shape == (48, 48, 3)

    def test_input_dtype_on_host_path(self, data_root):
        # input_dtype governs the final image dtype when the pipeline runs
        # fully on host (reference semantics); on the engine's device path
        # the task compute dtype wins (tested in engine tests). A trailing
        # host-only op keeps the whole chain on host: ImageCompression is a
        # codec round-trip (libjpeg), which can never run on device — unlike
        # GridDropout, which grew a device path in round 4 and silently
        # invalidated this test.
        host_only = {"name": "ImageCompression",
                     "params": {"quality_lower": 80, "p": 1.0}}
        # guard: if device coverage ever reaches this op, the host-dtype
        # semantics below would no longer be exercised — fail loudly so the
        # test gets re-anchored to another genuinely host-bound op
        probe = Constructor._create_transforms([host_only])
        assert not getattr(probe.transforms[0], "device_capable", False), (
            "ImageCompression grew a device path; re-anchor "
            "test_input_dtype_on_host_path to a host-only op")
        cfg = _TRANSFORM_CFG + [host_only]
        ds = _make("ImageClassificationDataset", data_root, "mc.csv",
                   transform=Constructor._create_transforms(cfg),
                   input_dtype="float16")
        assert not ds.device_pipeline
        assert ds[0]["image"].dtype == np.float16

    def test_test_mode_drops_target(self, data_root):
        ds = _make("ImageClassificationDataset", data_root, "mc.csv",
                   test_mode=True)
        assert "target" not in ds[0]

    def test_multilabel_vector(self, data_root):
        ds = _make("ImageClassificationDataset", data_root, "ml.csv",
                   multilabel=True, num_classes=3)
        t = ds[0]["target"]
        assert t.shape == (3,)
        assert set(np.unique(t)) <= {0.0, 1.0}

    def test_lazy_init_defers_target(self, data_root):
        ds = _make("ImageClassificationDataset", data_root, "ml.csv",
                   multilabel=True, num_classes=3, lazy_init=True)
        assert ds[1]["target"].shape == (3,)


class TestSegmentationDataset:
    def test_keys_and_shapes(self, data_root):
        ds = _make("ImageSegmentationDataset", data_root, "seg.csv")
        # per-sample surface emits `target` (the loss-mapping key)
        assert sorted(ds[0].keys()) == ["image", "index", "target"]
        s = _full(ds, 0)
        assert s["image"].shape == (48, 48, 3)
        assert s["target"].shape[:2] == (48, 48)
        # nearest-neighbor-ish resize must keep label ids, not blend them
        assert set(np.unique(s["target"]).tolist()) <= {0, 1, 2}

    def test_mask_dtype(self, data_root):
        ds = _make("ImageSegmentationDataset", data_root, "seg.csv",
                   target_dtype="int32")
        assert ds[0]["target"].dtype == np.int32

    def test_test_mode_drops_mask(self, data_root):
        ds = _make("ImageSegmentationDataset", data_root, "seg.csv",
                   test_mode=True)
        assert "target" not in ds[0] and "mask" not in ds[0]


class TestContrastiveDataset:
    def test_two_views_differ_in_augment_only(self, data_root):
        ds = DATASETS.get("UnsupervisedContrastiveDataset")(
            data_folder=str(data_root), annotation_path="mc.csv",
            transform=TRANSFORM(), augment=AUGMENT())
        s = ds[0]
        assert s["image_0"].shape == (48, 48, 3)
        assert s["image_1"].shape == (48, 48, 3)


class TestSyntheticShapes:
    def test_classification_variant_learnable_split(self):
        from torchok_tpu.data.datasets.examples.synthetic import SyntheticShapesDataset
        tr = SyntheticShapesDataset(transform=[], num_samples=50, train=True)
        va = SyntheticShapesDataset(transform=[], num_samples=50, train=False)
        # disjoint generator seeds -> different images
        assert not np.array_equal(tr.images[0], va.images[0])
        assert tr[0]["image"].shape == (32, 32, 3)

    def test_segmentation_variant_mask_alignment(self):
        from torchok_tpu.data.datasets.examples.synthetic import (
            SyntheticShapesSegmentationDataset)
        ds = SyntheticShapesSegmentationDataset(transform=[], num_samples=40)
        s = ds[0]
        assert s["target"].shape == (32, 32)
        labels = set(np.unique(s["target"]).tolist())
        assert labels <= set(range(11))
        # the mask's nonzero id must match the sample's class + 1
        nz = s["target"][s["target"] > 0]
        if len(nz):
            assert set(np.unique(nz).tolist()) == {int(ds.targets[0]) + 1}
        # vectorized batch fetch agrees with per-item access (batch path
        # carries pixel labels as 'mask' for the device pipeline)
        b = ds.get_batch(np.arange(4))
        assert b["mask"].shape == (4, 32, 32)
        assert np.array_equal(b["mask"][0], s["target"])
