"""Bbox-geometry consistency for every geometric transform.

The reference gets bbox handling from albumentations BboxParams
(torchok/constructor/constructor.py:325-358); here each geometric op owns
its bbox mapping and the base class raises when a geometric op without a
handler sees bboxes. These tests verify the handlers against a
mask-rasterization oracle: draw the box as a binary mask, run the image
path, and check the transformed box tightly contains the transformed mask.
"""
import numpy as np
import pytest

from torchok_tpu.constructor import TRANSFORMS
from torchok_tpu.data.transforms.base import BaseTransform


H, W = 64, 48
BOXES = np.array([[10.0, 8.0, 30.0, 40.0], [2.0, 2.0, 12.0, 10.0]], np.float32)


def _mask_for(box, h=H, w=W):
    m = np.zeros((h, w), np.uint8)
    x0, y0, x1, y1 = [int(round(v)) for v in box]
    m[y0:y1, x0:x1] = 1
    return m


def _bbox_of_mask(mask):
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return None
    return np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], np.float32)


def _image():
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (H, W, 3), np.uint8)


def _run(t, boxes=BOXES, image=None):
    t.seed(0)
    sample = {"image": _image() if image is None else image,
              "bboxes": boxes.copy(),
              "mask": _mask_for(boxes[0])}
    return t(force_apply=True, **sample)


def _check_box_tracks_mask(t, tol=3.0):
    """Transformed bbox[0] must tightly bound the transformed rasterized
    mask of the original bbox[0] (within interpolation tolerance)."""
    out = _run(t)
    got = np.asarray(out["bboxes"], np.float32).reshape(-1, 4)[0]
    expected = _bbox_of_mask(np.asarray(out["mask"]))
    assert expected is not None, "mask vanished"
    assert np.allclose(got, expected, atol=tol), f"{got} vs mask-box {expected}"


@pytest.mark.parametrize("name,params", [
    ("HorizontalFlip", {}),
    ("VerticalFlip", {}),
    ("Flip", {}),
    ("Resize", {"height": 32, "width": 32}),
    ("FitResize", {"max_height": 32, "max_width": 32}),
    ("LongestMaxSize", {"max_size": 32}),
    ("SmallestMaxSize", {"max_size": 24}),
    # border_mode 0 = constant: the mask-rasterization oracle needs padding
    # that does not reflect mask content into the borders
    ("PadIfNeeded", {"min_height": 96, "min_width": 96, "border_mode": 0,
                     "value": 0, "mask_value": 0}),
    ("CenterCrop", {"height": 40, "width": 32}),
    ("Crop", {"x_min": 4, "y_min": 4, "x_max": 40, "y_max": 56}),
    ("RandomCrop", {"height": 40, "width": 32}),
    ("RandomResizedCrop", {"height": 32, "width": 32, "scale": (0.6, 0.9)}),
    ("RandomScale", {"scale_limit": 0.3}),
    ("RandomRotate90", {}),
    ("Transpose", {}),
    ("RandomSizedCrop", {"min_max_height": (40, 56), "height": 32, "width": 32}),
    ("BBoxSafeRandomCrop", {}),
    ("RandomSizedBBoxSafeCrop", {"height": 32, "width": 32}),
    ("RandomCropFromBorders", {}),
    ("CropAndPad", {"px": 6}),
    ("CropAndPad", {"px": -6}),
    ("CropNonEmptyMaskIfExists", {"height": 40, "width": 32}),
])
def test_geometric_bbox_tracks_mask(name, params):
    _check_box_tracks_mask(TRANSFORMS.get(name)(**params))


@pytest.mark.parametrize("name,params,tol", [
    # envelope ops: the transformed box must CONTAIN the mask box (the
    # axis-aligned envelope of rotated corners is a superset) and stay
    # within a few px of tight
    ("Rotate", {"limit": 30, "border_mode": 0, "value": 0, "mask_value": 0}, 8.0),
    ("SafeRotate", {"limit": 30, "border_mode": 0, "value": 0,
                    "mask_value": 0}, 8.0),
    ("ShiftScaleRotate", {"shift_limit": 0.05, "scale_limit": 0.1,
                          "rotate_limit": 20, "border_mode": 0, "value": 0,
                          "mask_value": 0}, 8.0),
    ("Affine", {"rotate": 15, "translate_percent": 0.05}, 8.0),
    ("Perspective", {"scale": (0.02, 0.05)}, 8.0),
])
def test_warp_bbox_envelope_contains_mask(name, params, tol):
    t = TRANSFORMS.get(name)(**params)
    t.seed(0)
    out = _run(t)
    got = np.asarray(out["bboxes"], np.float32).reshape(-1, 4)[0]
    mask_box = _bbox_of_mask(np.asarray(out["mask"]))
    assert mask_box is not None
    # containment with small slack (nearest-neighbor mask erosion at edges)
    assert got[0] <= mask_box[0] + 2 and got[1] <= mask_box[1] + 2
    assert got[2] >= mask_box[2] - 2 and got[3] >= mask_box[3] - 2
    # and not wildly loose
    assert got[2] - got[0] <= (mask_box[2] - mask_box[0]) + 2 * tol
    assert got[3] - got[1] <= (mask_box[3] - mask_box[1]) + 2 * tol


@pytest.mark.parametrize("name", [
    "ElasticTransform", "GridDistortion", "OpticalDistortion",
    "PiecewiseAffine", "RandomGridShuffle",
])
def test_nonlinear_ops_raise_on_bboxes(name):
    t = TRANSFORMS.get(name)(p=1.0)
    t.seed(0)
    with pytest.raises(NotImplementedError):
        t(force_apply=True, image=_image(), bboxes=BOXES.copy())


def test_geometric_guard_catches_missing_handler():
    class Bad(BaseTransform):
        geometric = True
        always_apply = True

        def apply(self, image, **params):
            return image[::2]

    with pytest.raises(NotImplementedError):
        Bad()(image=_image(), bboxes=BOXES.copy())


def test_full_detection_recipe_pipeline_keeps_boxes_aligned():
    """The shipped detection recipe chain (HorizontalFlip + FitResize +
    PadIfNeeded) must move GT boxes with the image."""
    from torchok_tpu.data.transforms.base import Compose

    chain = Compose([
        TRANSFORMS.get("HorizontalFlip")(p=1.0),
        TRANSFORMS.get("FitResize")(max_height=32, max_width=32),
        TRANSFORMS.get("PadIfNeeded")(min_height=32, min_width=32),
    ])
    chain.seed(0)
    out = chain(image=_image(), bboxes=BOXES.copy(), mask=_mask_for(BOXES[0]))
    got = np.asarray(out["bboxes"], np.float32).reshape(-1, 4)[0]
    expected = _bbox_of_mask(np.asarray(out["mask"]))
    assert np.allclose(got, expected, atol=3.0), f"{got} vs {expected}"


def test_detection_dataset_filters_clipped_boxes():
    from torchok_tpu.data.datasets.detection.detection import DetectionDataset

    boxes = np.array([[0.0, 0.0, 20.0, 20.0], [40.0, 40.0, 47.0, 60.0]], np.float32)
    labels = np.array([3, 5], np.int64)
    # crop that fully removes the second box
    cropped = boxes.copy()
    cropped[:, [0, 2]] = np.clip(cropped[:, [0, 2]], 0, 30)
    cropped[:, [1, 3]] = np.clip(cropped[:, [1, 3]], 0, 30)
    kept_b, kept_l = DetectionDataset._drop_degenerate(cropped, labels)
    assert len(kept_b) == 1 and kept_l.tolist() == [3]
