from torchok_tpu.tasks.base import BaseTask
from torchok_tpu.tasks.classification import ClassificationTask
from torchok_tpu.tasks.segmentation import SegmentationTask
