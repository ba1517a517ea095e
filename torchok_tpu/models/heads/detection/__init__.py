from torchok_tpu.models.heads.detection.fcos import FCOSHead
