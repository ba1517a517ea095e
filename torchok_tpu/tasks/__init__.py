from torchok_tpu.tasks.base import BaseTask
from torchok_tpu.tasks.classification import ClassificationTask
