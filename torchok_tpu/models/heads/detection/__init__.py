from torchok_tpu.models.heads.detection.fcos import FCOSHead
from torchok_tpu.models.heads.detection.detr import DETRHead
