"""torchok_tpu — a TPU-native computer-vision training framework.

A from-scratch JAX/Flax/Pallas rebuild of the capability surface of the
reference TorchOk toolkit (YAML-configured model assembly, tasks, data
pipelines, metrics, export), re-designed for TPU: GSPMD data parallelism,
on-device augmentation, jitted train loops, Orbax checkpoints and StableHLO
export.
"""
__version__ = "0.1.0"

# Importing submodules populates the global registries.
from torchok_tpu import constructor  # noqa: F401
from torchok_tpu import losses  # noqa: F401
from torchok_tpu import metrics  # noqa: F401
from torchok_tpu import optim  # noqa: F401
from torchok_tpu import models  # noqa: F401
from torchok_tpu import data  # noqa: F401
from torchok_tpu import tasks  # noqa: F401
from torchok_tpu import callbacks  # noqa: F401
from torchok_tpu.constructor import (  # noqa: F401
    BACKBONES, CALLBACKS, DATASETS, DETECTION_NECKS, HEADS, LOSSES, METRICS,
    NECKS, OPTIMIZERS, POOLINGS, SAMPLERS, SCHEDULERS, TASKS, TRANSFORMS,
)
import torchok_tpu.constructor.logger  # noqa: F401
