import torchok_tpu.callbacks.common  # noqa: F401
from torchok_tpu.callbacks.model_checkpoint import ModelCheckpoint
from torchok_tpu.callbacks.freeze_unfreeze import FreezeUnfreeze, BackboneFinetuning
from torchok_tpu.callbacks.checkpoint_stablehlo import CheckpointStableHLO, CheckpointONNX
