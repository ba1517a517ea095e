from torchok_tpu.tasks.base import BaseTask
from torchok_tpu.tasks.classification import ClassificationTask
from torchok_tpu.tasks.segmentation import SegmentationTask
from torchok_tpu.tasks.pairwise_task import PairwiseLearnTask
from torchok_tpu.tasks.simclr_task import SimCLRTask
from torchok_tpu.tasks.triplet_task import TripletLearnTask
from torchok_tpu.tasks.multihead_classification import MultiHeadClassificationTask
from torchok_tpu.tasks.stablehlo_task import StableHLOTask, ONNXTask
