"""End-to-end detection training test (FCOS + FPN + mAP) on a tiny generated
dataset — the reference covers this path only in GPU CI; here the full
assign/loss/decode/NMS/mAP loop runs on the simulated-CPU mesh."""
import json

import cv2
import numpy as np
import pytest

import torchok_tpu  # noqa: F401
from torchok_tpu.constructor import TASKS
from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.constructor.config_structure import merge_structured
from torchok_tpu.constructor.runner import create_trainer


@pytest.fixture(scope="module")
def det_data(tmp_path_factory):
    """Eight 64x64 images, each with one bright rectangle = one box."""
    root = tmp_path_factory.mktemp("det")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(8):
        img = rng.integers(0, 60, size=(64, 64, 3), dtype=np.uint8)
        x0, y0 = int(rng.integers(4, 30)), int(rng.integers(4, 30))
        w, h = int(rng.integers(12, 24)), int(rng.integers(12, 24))
        img[y0:y0 + h, x0:x0 + w] = 220
        name = f"img_{i}.png"
        cv2.imwrite(str(root / name), img)
        rows.append({"image_path": name,
                     "bbox": json.dumps([[x0, y0, w, h]]),  # coco xywh
                     "label": json.dumps([0])})
    import pandas as pd
    pd.DataFrame(rows).to_csv(root / "ann.csv", index=False)
    return root


def make_det_config(root, tmp_path):
    cfg = {
        "task": {
            "name": "SingleStageDetectionTask",
            "params": {
                "backbone_name": "resnet10t",
                "backbone_params": {"pretrained": False, "in_channels": 3},
                "num_scales": 3,
                "neck_name": "FPN",
                "neck_params": {"out_channels": 32, "num_outs": 3},
                "head_name": "FCOSHead",
                "head_params": {
                    "num_classes": 1,
                    "strides": [8, 16, 32],
                    "feat_channels": 32,
                    "stacked_convs": 1,
                    "test_cfg": {"nms_pre": 50, "score_thr": 0.05,
                                 "nms": {"iou_threshold": 0.5},
                                 "max_per_img": 10},
                },
                "inputs": [{"shape": [3, 64, 64], "dtype": "float32"}],
            },
        },
        "joint_loss": {
            "normalize_weights": False,
            "losses": [
                {"name": "MMFocalLoss", "tag": "loss_cls",
                 "params": {"use_sigmoid": True, "gamma": 2.0, "alpha": 0.25},
                 "mapping": {"pred": "flatten_cls_scores",
                             "target": "flatten_labels",
                             "avg_factor": "num_pos"}},
                {"name": "MMIoULoss", "tag": "loss_bbox",
                 "mapping": {"pred": "pos_decoded_bbox_preds",
                             "target": "pos_decoded_target_preds",
                             "weight": "pos_centerness_targets",
                             "avg_factor": "centerness_denorm"}},
                {"name": "MMCrossEntropyLoss", "tag": "loss_centerness",
                 "params": {"use_sigmoid": True},
                 "mapping": {"cls_score": "pos_centerness",
                             "label": "pos_centerness_targets",
                             "avg_factor": "num_pos"}},
            ],
        },
        "optimization": [
            {"optimizer": {"name": "SGD",
                           "params": {"lr": 0.01, "momentum": 0.9}}},
        ],
        "data": {
            "TRAIN": [{
                "dataloader": {"batch_size": 4, "num_workers": 1,
                               "drop_last": True, "shuffle": True},
                "dataset": {
                    "name": "DetectionDataset",
                    "params": {"data_folder": str(root),
                               "annotation_path": "ann.csv",
                               "bbox_format": "coco", "max_boxes": 4},
                    "transform": [
                        {"name": "Normalize"},
                        {"name": "ToTensorV2"},
                    ],
                },
            }],
            "VALID": [{
                "dataloader": {"batch_size": 4, "num_workers": 1},
                "dataset": {
                    "name": "DetectionDataset",
                    "params": {"data_folder": str(root),
                               "annotation_path": "ann.csv",
                               "bbox_format": "coco", "max_boxes": 4},
                    "transform": [
                        {"name": "Normalize"},
                        {"name": "ToTensorV2"},
                    ],
                },
            }],
        },
        "trainer": {"max_epochs": 2, "precision": 32, "log_every_n_steps": 10},
        "logger": {"name": "CSVLogger", "log_dir": str(tmp_path / "logs"),
                   "experiment_name": "det"},
        "metrics": [
            {"name": "MMDetectionMAP", "tag": "map50",
             "params": {"iou_thr": 0.5, "num_classes": 1},
             "mapping": {"preds": "prediction", "target": "target"},
             "phases": ["VALID"]},
        ],
        "seed_params": {"seed": 3},
    }
    return merge_structured(ConfigNode(cfg))


def test_fcos_training_runs_and_logs_map(det_data, tmp_path):
    config = make_det_config(det_data, tmp_path)
    params = config.task.params.to_dict()
    task = TASKS.get(config.task.name)(config, **params)
    trainer = create_trainer(config)
    trainer.fit(task)
    logs = trainer.callback_metrics
    assert "train/loss" in logs and np.isfinite(logs["train/loss"])
    assert "valid/map50" in logs
    assert 0.0 <= logs["valid/map50"] <= 1.0


def test_detr_training_with_shipped_loss_mappings(det_data, tmp_path):
    """DETR head must train with the exact loss-mapping keys the shipped
    recipes use (cls_scores/labels, bboxes/bboxes_gt, bbox_preds/bbox_targets)."""
    cfg = {
        "task": {
            "name": "SingleStageDetectionTask",
            "params": {
                "backbone_name": "resnet10t",
                "backbone_params": {"pretrained": False, "in_channels": 3},
                "num_scales": 1,
                "head_name": "DETRHead",
                "head_params": {
                    "num_classes": 1,
                    "num_queries": 8,
                    "embed_dim": 32,
                    "num_heads": 2,
                    "num_encoder_layers": 1,
                    "num_decoder_layers": 1,
                    "ffn_dim": 64,
                    "test_cfg": {"max_per_img": 5},
                },
                "inputs": [{"shape": [3, 64, 64], "dtype": "float32"}],
            },
        },
        "joint_loss": {
            "normalize_weights": False,
            "losses": [
                {"name": "MMCrossEntropyLoss", "tag": "loss_cls",
                 "params": {"use_sigmoid": False, "class_weight": 1.0},
                 "mapping": {"cls_score": "cls_scores", "label": "labels",
                             "weight": "label_weights",
                             "avg_factor": "cls_avg_factor"}},
                {"name": "MMGIoULoss", "tag": "loss_iou",
                 "mapping": {"pred": "bboxes", "target": "bboxes_gt",
                             "weight": "bbox_weights",
                             "avg_factor": "num_total_pos"}},
                {"name": "MML1Loss", "tag": "loss_bbox",
                 "mapping": {"pred": "bbox_preds", "target": "bbox_targets",
                             "weight": "bbox_weights",
                             "avg_factor": "num_total_pos"}},
            ],
        },
        "optimization": [
            {"optimizer": {"name": "AdamW", "params": {"lr": 1e-4}}}],
        "data": {"TRAIN": [{
            "dataloader": {"batch_size": 4, "num_workers": 1, "drop_last": True},
            "dataset": {"name": "DetectionDataset",
                        "params": {"data_folder": str(det_data),
                                   "annotation_path": "ann.csv",
                                   "bbox_format": "coco", "max_boxes": 4},
                        "transform": [{"name": "Normalize"},
                                      {"name": "ToTensorV2"}]}}]},
        "trainer": {"max_epochs": 1, "precision": 32},
        "logger": {"name": "CSVLogger", "log_dir": str(tmp_path / "logs"),
                   "experiment_name": "detr"},
        "metrics": [],
        "seed_params": {"seed": 3},
    }
    config = merge_structured(ConfigNode(cfg))
    task = TASKS.get(config.task.name)(config, **config.task.params.to_dict())
    trainer = create_trainer(config)
    trainer.fit(task)
    assert np.isfinite(trainer.callback_metrics["train/loss"])


def test_fcos_training_through_dcn_neck(det_data, tmp_path):
    """FCOS through NASFCOS_FPN exercises the DCNv2 op (offsets, bilinear
    gather, MXU contraction) in an actual training loop: loss must be finite
    and decrease-ish over two epochs."""
    config = make_det_config(det_data, tmp_path)
    config.task.params.neck_name = "NASFCOS_FPN"
    config.task.params.neck_params = ConfigNode(
        {"out_channels": 32, "num_outs": 3})
    config = merge_structured(config)
    params = config.task.params.to_dict()
    task = TASKS.get(config.task.name)(config, **params)
    trainer = create_trainer(config)
    trainer.fit(task)
    assert np.isfinite(trainer.callback_metrics["train/loss"])
