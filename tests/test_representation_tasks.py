"""End-to-end training tests for the metric-learning / representation task
stack (reference: tasks/pairwise_task.py, simclr_task.py, triplet_task.py,
multihead_classification.py + ArcFaceHead) on tiny generated data."""
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
def image_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("rep")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(16):
        img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        name = f"im_{i}.png"
        cv2.imwrite(str(root / name), img)
        rows.append({"image_path": name, "label": i % 4})
    import pandas as pd
    pd.DataFrame(rows).to_csv(root / "ann.csv", index=False)
    return root


def _base(tmp_path, task_block, loss_block, data_block, metrics=()):
    cfg = {
        "task": task_block,
        "joint_loss": {"losses": list(loss_block)},
        "optimization": [
            {"optimizer": {"name": "Adam", "params": {"lr": 1e-3}}}],
        "data": data_block,
        "trainer": {"max_epochs": 1, "precision": 32, "log_every_n_steps": 10},
        "logger": {"name": "CSVLogger", "log_dir": str(tmp_path / "logs"),
                   "experiment_name": "rep"},
        "metrics": list(metrics),
        "seed_params": {"seed": 5},
    }
    return merge_structured(ConfigNode(cfg))


def _fit(config):
    params = config.task.params.to_dict()
    task = TASKS.get(config.task.name)(config, **params)
    trainer = create_trainer(config)
    trainer.fit(task)
    return task, trainer


TRANSFORM = [{"name": "Resize", "params": {"height": 32, "width": 32}},
             {"name": "Normalize"}, {"name": "ToTensorV2"}]


def test_simclr_task_trains(image_root, tmp_path):
    config = _base(
        tmp_path,
        {"name": "SimCLRTask", "params": {
            "backbone_name": "resnet10t",
            "backbone_params": {"pretrained": False, "in_channels": 3},
            "pooling_name": "Pooling",
            "inputs": [{"shape": [3, 32, 32], "dtype": "float32"}]}},
        [{"name": "NT_XentLoss", "params": {"temperature": 0.2},
          "mapping": {"emb1": "emb1", "emb2": "emb2"}}],
        {"TRAIN": [{
            "dataloader": {"batch_size": 8, "num_workers": 1, "drop_last": True},
            "dataset": {"name": "UnsupervisedContrastiveDataset",
                        "params": {"data_folder": str(image_root),
                                   "annotation_path": "ann.csv"},
                        "augment": [{"name": "HorizontalFlip"},
                                    {"name": "RandomBrightnessContrast"}],
                        "transform": TRANSFORM}}]})
    task, trainer = _fit(config)
    assert np.isfinite(trainer.callback_metrics["train/loss"])


def test_pairwise_task_trains(image_root, tmp_path):
    config = _base(
        tmp_path,
        {"name": "PairwiseLearnTask", "params": {
            "num_classes": 4,
            "backbone_name": "resnet10t",
            "backbone_params": {"pretrained": False, "in_channels": 3},
            "pooling_name": "PoolingLinear",
            "pooling_params": {"out_channels": 16},
            "inputs": [{"shape": [3, 32, 32], "dtype": "float32"}]}},
        [{"name": "ContrastiveLoss", "params": {"margin": 0.5},
          "mapping": {"emb1": "emb1", "emb2": "emb2", "R": "R"}}],
        {"TRAIN": [{
            "dataloader": {"batch_size": 8, "num_workers": 1, "drop_last": True},
            "dataset": {"name": "ImageClassificationDataset",
                        "params": {"data_folder": str(image_root),
                                   "annotation_path": "ann.csv",
                                   "num_classes": 4},
                        "transform": TRANSFORM}}]})
    task, trainer = _fit(config)
    assert np.isfinite(trainer.callback_metrics["train/loss"])


def test_classification_task_with_arcface_trains(image_root, tmp_path):
    config = _base(
        tmp_path,
        {"name": "ClassificationTask", "params": {
            "backbone_name": "resnet10t",
            "backbone_params": {"pretrained": False, "in_channels": 3},
            "pooling_name": "PoolingLinear",
            "pooling_params": {"out_channels": 16},
            "head_name": "ArcFaceHead",
            "head_params": {"num_classes": 4},
            "inputs": [{"shape": [3, 32, 32], "dtype": "float32"}]}},
        [{"name": "CrossEntropyLoss",
          "mapping": {"input": "prediction", "target": "target"}}],
        {"TRAIN": [{
            "dataloader": {"batch_size": 8, "num_workers": 1, "drop_last": True},
            "dataset": {"name": "ImageClassificationDataset",
                        "params": {"data_folder": str(image_root),
                                   "annotation_path": "ann.csv",
                                   "num_classes": 4},
                        "transform": TRANSFORM}}]})
    task, trainer = _fit(config)
    assert np.isfinite(trainer.callback_metrics["train/loss"])


@pytest.fixture(scope="module")
def multihead_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh")
    rng = np.random.default_rng(1)
    rows = []
    for i in range(16):
        img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        name = f"im_{i}.png"
        cv2.imwrite(str(root / name), img)
        rows.append({"image_path": name, "label_a": i % 4, "label_b": i % 2})
    import pandas as pd
    pd.DataFrame(rows).to_csv(root / "ann.csv", index=False)
    return root


def test_multihead_task_trains(multihead_root, tmp_path):
    config = _base(
        tmp_path,
        {"name": "MultiHeadClassificationTask", "params": {
            "backbone_name": "resnet10t",
            "backbone_params": {"pretrained": False, "in_channels": 3},
            "pooling_name": "Pooling",
            "heads": [
                {"name": "a", "type": "ClassificationHead", "target": "a",
                 "params": {"num_classes": 4}},
                {"name": "b", "type": "ClassificationHead", "target": "b",
                 "params": {"num_classes": 2}},
            ],
            "inputs": [{"shape": [3, 32, 32], "dtype": "float32"}]}},
        [{"name": "CrossEntropyLoss", "tag": "a",
          "mapping": {"input": "prediction_a", "target": "target_a"}},
         {"name": "CrossEntropyLoss", "tag": "b",
          "mapping": {"input": "prediction_b", "target": "target_b"}}],
        {"TRAIN": [{
            "dataloader": {"batch_size": 8, "num_workers": 1, "drop_last": True},
            "dataset": {"name": "MultiHeadImageDataset",
                        "params": {"data_folder": str(multihead_root),
                                   "annotation_path": "ann.csv",
                                   "targets": [
                                       {"name": "a", "column": "label_a",
                                        "target_type": "multiclass"},
                                       {"name": "b", "column": "label_b",
                                        "target_type": "multiclass"}]},
                        "transform": TRANSFORM}}]})
    task, trainer = _fit(config)
    assert np.isfinite(trainer.callback_metrics["train/loss"])


def test_arcface_margin_behaviour():
    """ArcFace: training logits for the target class are penalized by the
    additive angular margin; eval logits are plain cosine * scale."""
    import jax
    import jax.numpy as jnp
    from torchok_tpu.constructor import HEADS
    head = HEADS.get("ArcFaceHead")(in_channels=8, num_classes=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8)).astype(np.float32))
    t = jnp.asarray(np.array([1, 3]))
    variables = head.init(jax.random.PRNGKey(0), x, t, train=True)
    train_out = head.apply(variables, x, t, train=True,
                           mutable=["buffers"])[0]
    eval_out = head.apply(variables, x, None, train=False,
                          mutable=["buffers"])[0]
    # margin reduces the target-class logit relative to eval
    for row, cls in enumerate([1, 3]):
        assert float(train_out[row, cls]) < float(eval_out[row, cls]) + 1e-6


def test_multihead_arcface_head_trains(multihead_root, tmp_path):
    """Stateful head behind a non-standard target key: MultiHead task with an
    ArcFace head must initialize its buffers collection (example_targets
    override) and train."""
    config = _base(
        tmp_path,
        {"name": "MultiHeadClassificationTask", "params": {
            "backbone_name": "resnet10t",
            "backbone_params": {"pretrained": False, "in_channels": 3},
            "pooling_name": "PoolingLinear",
            "pooling_params": {"out_channels": 16},
            "heads": [
                {"name": "a", "type": "ArcFaceHead", "target": "a",
                 "params": {"num_classes": 4}},
            ],
            "inputs": [{"shape": [3, 32, 32], "dtype": "float32"}]}},
        [{"name": "CrossEntropyLoss", "tag": "a",
          "mapping": {"input": "prediction_a", "target": "target_a"}}],
        {"TRAIN": [{
            "dataloader": {"batch_size": 8, "num_workers": 1, "drop_last": True},
            "dataset": {"name": "MultiHeadImageDataset",
                        "params": {"data_folder": str(multihead_root),
                                   "annotation_path": "ann.csv",
                                   "targets": [
                                       {"name": "a", "column": "label_a",
                                        "target_type": "multiclass"}]},
                        "transform": TRANSFORM}}]})
    task, trainer = _fit(config)
    assert np.isfinite(trainer.callback_metrics["train/loss"])


def test_swa_with_arcface_buffers(image_root, tmp_path):
    """SWA's BN-refresh must thread the buffers collection (ArcFace step
    counter) through its train-mode forward."""
    cfg_block = {"name": "ClassificationTask", "params": {
        "backbone_name": "resnet10t",
        "backbone_params": {"pretrained": False, "in_channels": 3},
        "pooling_name": "PoolingLinear",
        "pooling_params": {"out_channels": 16},
        "head_name": "ArcFaceHead",
        "head_params": {"num_classes": 4},
        "inputs": [{"shape": [3, 32, 32], "dtype": "float32"}]}}
    config = _base(
        tmp_path, cfg_block,
        [{"name": "CrossEntropyLoss",
          "mapping": {"input": "prediction", "target": "target"}}],
        {"TRAIN": [{
            "dataloader": {"batch_size": 8, "num_workers": 1, "drop_last": True},
            "dataset": {"name": "ImageClassificationDataset",
                        "params": {"data_folder": str(image_root),
                                   "annotation_path": "ann.csv",
                                   "num_classes": 4},
                        "transform": TRANSFORM}}]})
    config.callbacks = [ConfigNode({
        "name": "StochasticWeightAveraging",
        "params": {"swa_epoch_start": 0, "bn_update_steps": 1}})]
    task, trainer = _fit(config)
    assert np.isfinite(trainer.callback_metrics["train/loss"])
