"""Global component registries (reference: torchok/constructor/__init__.py:4-17)."""
from torchok_tpu.constructor.registry import Registry

DATASETS = Registry("datasets")
TRANSFORMS = Registry("transforms")
OPTIMIZERS = Registry("optimizers")
SCHEDULERS = Registry("schedulers")
LOSSES = Registry("losses")
METRICS = Registry("metrics")
CALLBACKS = Registry("callbacks")
TASKS = Registry("tasks")
BACKBONES = Registry("backbones")
POOLINGS = Registry("poolings")
HEADS = Registry("heads")
NECKS = Registry("necks")
DETECTION_NECKS = Registry("detection_necks")
SAMPLERS = Registry("samplers")
LOGGERS = Registry("loggers")

from torchok_tpu.constructor.config import ConfigNode, load_config  # noqa: E402
from torchok_tpu.constructor.config_structure import ConfigParams, Phase, merge_structured  # noqa: E402


def __getattr__(name):
    # Constructor pulls in the data/loss/metric/optim layers; import lazily to
    # keep `from torchok_tpu.constructor import BACKBONES` cheap for model files.
    if name == "Constructor":
        from torchok_tpu.constructor.constructor import Constructor
        return Constructor
    raise AttributeError(name)
