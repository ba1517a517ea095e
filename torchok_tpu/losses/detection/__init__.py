from torchok_tpu.losses.detection.losses import (
    FocalLoss, GIoULoss, IoULoss, CrossEntropySigmoidLoss,
)
