"""End-to-end segmentation training (HRNet/U-Net necks + segmentation/OCR
heads + Dice/CE losses + JaccardIndex) on a tiny generated dataset —
mirrors the reference's sweet-pepper recipe shape
(examples/configs/segmentation_sweet_pepper.yaml)."""
import cv2
import numpy as np
import pytest

import torchok_tpu  # noqa: F401
from torchok_tpu.constructor import TASKS
from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.constructor.config_structure import merge_structured
from torchok_tpu.constructor.runner import create_trainer

TRANSFORM = [{"name": "Resize", "params": {"height": 64, "width": 64}},
             {"name": "Normalize"}, {"name": "ToTensorV2"}]


@pytest.fixture(scope="module")
def seg_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("seg")
    rng = np.random.default_rng(0)
    import pandas as pd
    rows = []
    for i in range(8):
        img = rng.integers(0, 60, size=(64, 64, 3), dtype=np.uint8)
        mask = np.zeros((64, 64), np.uint8)
        y0, x0 = rng.integers(8, 32, size=2)
        mask[y0:y0 + 20, x0:x0 + 20] = 1
        img[mask == 1] = 210
        cv2.imwrite(str(root / f"img_{i}.png"), img)
        cv2.imwrite(str(root / f"mask_{i}.png"), mask)
        rows.append({"image_path": f"img_{i}.png", "mask_path": f"mask_{i}.png"})
    pd.DataFrame(rows).to_csv(root / "ann.csv", index=False)
    return root


def _cfg(seg_root, tmp_path, neck, neck_params, head, head_params):
    cfg = {
        "task": {"name": "SegmentationTask", "params": {
            "backbone_name": "resnet10t",
            "backbone_params": {"pretrained": False, "in_channels": 3},
            "neck_name": neck,
            "neck_params": neck_params,
            "head_name": head,
            "head_params": {"num_classes": 2, **(head_params or {})},
            "inputs": [{"shape": [3, 64, 64], "dtype": "float32"}]}},
        "joint_loss": {"losses": [
            {"name": "CrossEntropyLoss",
             "mapping": {"input": "prediction", "target": "target"}},
            {"name": "DiceLoss", "params": {"mode": "multiclass"},
             "mapping": {"input": "prediction", "target": "target"}},
        ]},
        "optimization": [{"optimizer": {"name": "Adam", "params": {"lr": 1e-3}}}],
        "data": {
            "TRAIN": [{
                "dataloader": {"batch_size": 4, "num_workers": 1, "drop_last": True},
                "dataset": {"name": "ImageSegmentationDataset",
                            "params": {"data_folder": str(seg_root),
                                       "annotation_path": "ann.csv"},
                            "transform": TRANSFORM}}],
            "VALID": [{
                "dataloader": {"batch_size": 4, "num_workers": 1},
                "dataset": {"name": "ImageSegmentationDataset",
                            "params": {"data_folder": str(seg_root),
                                       "annotation_path": "ann.csv"},
                            "transform": TRANSFORM}}],
        },
        "trainer": {"max_epochs": 8, "precision": 32},
        "logger": {"name": "CSVLogger", "log_dir": str(tmp_path / "logs"),
                   "experiment_name": "seg"},
        "metrics": [
            {"name": "JaccardIndex", "tag": "iou",
             "params": {"task": "multiclass", "num_classes": 2},
             "mapping": {"preds": "prediction", "target": "target"},
             "phases": ["VALID"]},
        ],
        "seed_params": {"seed": 4},
    }
    return merge_structured(ConfigNode(cfg))


def _fit(config):
    task = TASKS.get(config.task.name)(config, **config.task.params.to_dict())
    trainer = create_trainer(config)
    trainer.fit(task)
    return trainer


def test_unet_segmentation_trains(seg_root, tmp_path):
    config = _cfg(seg_root, tmp_path, "UnetNeck", {}, "SegmentationHead", {})
    trainer = _fit(config)
    logs = trainer.callback_metrics
    assert np.isfinite(logs["train/loss"])
    assert "valid/iou" in logs
    # bright-rectangle-on-dark is trivially separable: IoU must beat the
    # all-background baseline within a few epochs
    assert logs["valid/iou"] > 0.5, logs["valid/iou"]


def test_ocr_segmentation_head_trains(seg_root, tmp_path):
    config = _cfg(seg_root, tmp_path, "UnetNeck", {},
                  "OCRSegmentationHead", {"ocr_mid_channels": 32,
                                          "ocr_key_channels": 16})
    trainer = _fit(config)
    assert np.isfinite(trainer.callback_metrics["train/loss"])


def test_uniform_seg_dataset_device_resize_keeps_mask_aligned(tmp_path):
    """Regression: a uniform-size segmentation dataset whose Resize runs in
    the device suffix must resize the pixel labels alongside the image (the
    labels ride as 'mask' and the engine renames to 'target' post-pipe)."""
    cfg = {
        "task": {
            "name": "SegmentationTask",
            "params": {
                "backbone_name": "resnet10t",
                "backbone_params": {"pretrained": False, "in_channels": 3},
                "neck_name": "UnetNeck",
                "neck_params": {"decoder_channels": [32, 16, 8, 8, 8]},
                "head_name": "SegmentationHead",
                "head_params": {"num_classes": 11},
                "inputs": [{"shape": [3, 64, 64], "dtype": "float32"}],
            },
        },
        "joint_loss": {"losses": [
            {"name": "CrossEntropyLoss",
             "mapping": {"input": "prediction", "target": "target"}}]},
        "optimization": [{"optimizer": {"name": "Adam", "params": {"lr": 1e-3}}}],
        "data": {"TRAIN": [{
            "dataloader": {"batch_size": 8, "num_workers": 0, "drop_last": True},
            "dataset": {
                "name": "SyntheticShapesSegmentationDataset",
                "params": {"num_samples": 16},  # native 32x32, resized 64x64
                "transform": [
                    {"name": "Resize", "params": {"height": 64, "width": 64}},
                    {"name": "Normalize"},
                    {"name": "ToTensorV2"},
                ],
            }}]},
        "trainer": {"max_epochs": 1, "precision": 32,
                    "num_sanity_val_steps": 0, "limit_train_batches": 2},
        "seed_params": {"seed": 1},
    }
    config = merge_structured(ConfigNode(cfg))
    task = TASKS.get(config.task.name)(config, **config.task.params.to_dict())
    trainer = create_trainer(config)
    trainer.fit(task)
    assert np.isfinite(trainer.callback_metrics["train/loss"])


def test_spatial_partitioning_segmentation_parity(seg_root, tmp_path,
                                                  multi_devices):
    """Spatial partitioning's home turf is dense prediction: images AND
    (B, H, W) masks must co-shard (batch over 'data', H over 'model') and
    the loss/IoU trajectory must equal the single-device run exactly."""
    config = _cfg(seg_root, tmp_path / "a", "UnetNeck", {},
                  "SegmentationHead", {})
    config.trainer["max_epochs"] = 2
    trainer1 = _fit(config)
    logs1 = trainer1.callback_metrics

    config2 = _cfg(seg_root, tmp_path / "b", "UnetNeck", {},
                   "SegmentationHead", {})
    config2.trainer["max_epochs"] = 2
    config2.trainer["strategy"] = "spatial"
    config2.trainer["model_parallel_size"] = 2
    config2.trainer["devices"] = len(multi_devices)
    trainer2 = _fit(config2)
    logs2 = trainer2.callback_metrics

    assert abs(logs1["train/loss"] - logs2["train/loss"]) < 1e-3
    # f32 reduction reordering (halo exchanges) perturbs weights at rounding
    # level over 2 epochs; boundary-pixel argmax flips bound IoU drift
    assert abs(logs1["valid/iou"] - logs2["valid/iou"]) < 5e-3

    host = {"image": np.zeros((4, 64, 64, 3), np.float32),
            "mask": np.zeros((4, 64, 64), np.int64)}
    sharded = trainer2._shard_batch(host)
    assert tuple(sharded["image"].sharding.spec)[:2] == ("data", "model")
    assert tuple(sharded["mask"].sharding.spec)[:2] == ("data", "model")
