"""Checkpoint + StableHLO export callback (reference:
torchok/callbacks/checkpoint_onnx.py:15-83 — ModelCheckpoint subclass that
also snapshots each best checkpoint as an inference artifact; ONNX is
replaced by StableHLO). Registered under both names so reference YAML
configs (`CheckpointONNX`) keep working."""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

from torchok_tpu.constructor import CALLBACKS
from torchok_tpu.callbacks.model_checkpoint import ModelCheckpoint

logger = logging.getLogger(__name__)


@CALLBACKS.register_class
class CheckpointStableHLO(ModelCheckpoint):
    def __init__(self, *args, remove_head: bool = False, **kwargs):
        kwargs.pop("onnx_params", None)  # reference-surface compatibility
        super().__init__(*args, **kwargs)
        self.remove_head = remove_head

    def on_checkpoint_saved(self, trainer, task, path: str) -> None:
        from torchok_tpu.export.stablehlo import export_task_model
        export_path = str(Path(path).with_suffix(".stablehlo"))
        try:
            export_task_model(task, trainer.state.variables, export_path,
                              remove_head=self.remove_head)
            logger.info("Exported StableHLO snapshot to %s", export_path)
        except Exception as e:  # noqa: BLE001 — export failure must not kill training
            logger.warning("StableHLO export failed for %s: %s", path, e)


@CALLBACKS.register_class(name="CheckpointONNX")
class CheckpointONNX(CheckpointStableHLO):
    """Name-parity alias: the TPU build exports StableHLO, not ONNX."""


@CALLBACKS.register_class(name="ModelCheckpointWithOnnx")
class ModelCheckpointWithOnnx(CheckpointStableHLO):
    """Name-parity alias used by the reference SOP recipes."""
