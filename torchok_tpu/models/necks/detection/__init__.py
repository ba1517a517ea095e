from torchok_tpu.models.necks.detection.fpn import FPN
