from torchok_tpu.models.heads.classification.classification_head import ClassificationHead
from torchok_tpu.models.heads.classification.arcface_head import ArcFaceHead
from torchok_tpu.models.heads.representation.linear_head import LinearHead
from torchok_tpu.models.heads.segmentation.base import SegmentationHead
from torchok_tpu.models.heads.segmentation.ocr import OCRSegmentationHead
from torchok_tpu.models.heads.detection.fcos import FCOSHead
from torchok_tpu.models.heads.detection.detr import DETRHead
