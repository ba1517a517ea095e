"""Retrieval validation through the full fit loop: PairwiseLearnTask trains
on labels while VALID runs a RetrievalDataset through the on-TPU index-based
meters (the reference's heaviest eval path, SURVEY.md §3.2). Also covers
TripletLearnTask with an in-file triplet dataset, mirroring the reference's
in-file fake-dataset test pattern."""
import cv2
import numpy as np
import pytest

import torchok_tpu  # noqa: F401
from torchok_tpu.constructor import DATASETS, TASKS
from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.constructor.config_structure import merge_structured
from torchok_tpu.constructor.runner import create_trainer
from torchok_tpu.data.datasets.base import ImageDataset

TRANSFORM = [{"name": "Resize", "params": {"height": 32, "width": 32}},
             {"name": "Normalize"}, {"name": "ToTensorV2"}]


@pytest.fixture(scope="module")
def retrieval_root(tmp_path_factory):
    """8 images; queries 0 and 1; each query has two relevant images."""
    root = tmp_path_factory.mktemp("retr")
    rng = np.random.default_rng(0)
    import pandas as pd
    rows = []
    for i in range(8):
        img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        name = f"r_{i}.png"
        cv2.imwrite(str(root / name), img)
        rows.append({"id": i, "image_path": name})
    pd.DataFrame(rows).to_csv(root / "img_list.csv", index=False)
    pd.DataFrame([
        {"query": 0, "relevant": "2 3", "scores": "1.0 0.5"},
        {"query": 1, "relevant": "4 5", "scores": "1.0 1.0"},
    ]).to_csv(root / "matches.csv", index=False)
    return root


def test_retrieval_validation_through_fit(retrieval_root, tmp_path):
    cfg = {
        "task": {"name": "PairwiseLearnTask",
                 "compute_loss_on_valid": False,
                 "params": {
            "num_classes": 4,
            "backbone_name": "resnet10t",
            "backbone_params": {"pretrained": False, "in_channels": 3},
            "pooling_name": "PoolingLinear",
            "pooling_params": {"out_channels": 16},
            "inputs": [{"shape": [3, 32, 32], "dtype": "float32"}]}},
        "joint_loss": {"losses": [
            {"name": "ContrastiveLoss", "params": {"margin": 0.5},
             "mapping": {"emb1": "emb1", "emb2": "emb2", "R": "R"}}]},
        "optimization": [{"optimizer": {"name": "Adam", "params": {"lr": 1e-3}}}],
        "data": {
            "TRAIN": [{
                "dataloader": {"batch_size": 4, "num_workers": 1, "drop_last": True},
                "dataset": {"name": "SyntheticClassificationDataset",
                            "params": {"num_samples": 16, "num_classes": 4},
                            "transform": TRANSFORM}}],
            "VALID": [{
                "dataloader": {"batch_size": 4, "num_workers": 1},
                "dataset": {"name": "RetrievalDataset",
                            "params": {"data_folder": str(retrieval_root),
                                       "matches_csv_path": "matches.csv",
                                       "img_list_csv_path": "img_list.csv"},
                            "transform": TRANSFORM}}],
        },
        "trainer": {"max_epochs": 1, "precision": 32},
        "logger": {"name": "CSVLogger", "log_dir": str(tmp_path / "logs"),
                   "experiment_name": "retr"},
        "metrics": [
            {"name": "HitAtKMeter", "tag": "hit1",
             "params": {"k": 1, "dataset_type": "representation",
                        "search_batch_size": 4},
             "mapping": {"vectors": "emb1", "scores": "scores",
                         "query_idxs": "query_idxs",
                         "group_labels": "group_labels"},
             "phases": ["VALID"]},
        ],
        "seed_params": {"seed": 6},
    }
    config = merge_structured(ConfigNode(cfg))
    task = TASKS.get(config.task.name)(config, **config.task.params.to_dict())
    trainer = create_trainer(config)
    trainer.fit(task)
    logs = trainer.callback_metrics
    assert "valid/hit1" in logs
    assert 0.0 <= logs["valid/hit1"] <= 1.0


@DATASETS.register_class
class _InlineTripletDataset(ImageDataset):
    """In-file triplet dataset (reference test pattern: register fake
    datasets into DATASETS inside the test module)."""

    def __init__(self, transform, augment=None, num_samples: int = 8,
                 input_dtype: str = "float32", **_):
        super().__init__(transform=transform, augment=augment,
                         input_dtype=input_dtype)
        rng = np.random.default_rng(2)
        self.images = rng.integers(0, 256, size=(num_samples, 3, 32, 32, 3),
                                   dtype=np.uint8)

    def __len__(self):
        return len(self.images)

    def get_raw(self, idx: int) -> dict:
        a, p, n = self.images[idx]
        sample = {"anchor": a, "positive": p, "negative": n, "index": idx}
        return sample

    def __getitem__(self, idx: int) -> dict:
        sample = self.get_raw(idx)
        out = {"index": idx}
        for key in ("anchor", "positive", "negative"):
            s = self.apply_host_pipeline({"image": sample[key]})
            out[key] = s["image"].astype(np.float32)
        return out


def test_triplet_task_trains(tmp_path):
    cfg = {
        "task": {"name": "TripletLearnTask", "params": {
            "backbone_name": "resnet10t",
            "backbone_params": {"pretrained": False, "in_channels": 3},
            "pooling_name": "Pooling",
            "inputs": [{"shape": [3, 32, 32], "dtype": "float32"}]}},
        "joint_loss": {"losses": [
            {"name": "TripletMarginLoss", "params": {"margin": 0.5},
             "mapping": {"anchor": "anchor", "positive": "positive",
                         "negative": "negative"}}]},
        "optimization": [{"optimizer": {"name": "Adam", "params": {"lr": 1e-3}}}],
        "data": {"TRAIN": [{
            "dataloader": {"batch_size": 4, "num_workers": 1, "drop_last": True},
            "dataset": {"name": "_InlineTripletDataset",
                        "params": {"num_samples": 8},
                        "transform": TRANSFORM}}]},
        "trainer": {"max_epochs": 1, "precision": 32},
        "logger": {"name": "CSVLogger", "log_dir": str(tmp_path / "logs"),
                   "experiment_name": "tri"},
        "metrics": [],
        "seed_params": {"seed": 6},
    }
    config = merge_structured(ConfigNode(cfg))
    task = TASKS.get(config.task.name)(config, **config.task.params.to_dict())
    trainer = create_trainer(config)
    trainer.fit(task)
    assert np.isfinite(trainer.callback_metrics["train/loss"])
