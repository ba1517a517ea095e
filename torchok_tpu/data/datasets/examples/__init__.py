from torchok_tpu.data.datasets.examples.cifar import CIFAR10, CIFAR100
from torchok_tpu.data.datasets.examples.synthetic import (
    SyntheticClassificationDataset, SyntheticShapesDataset,
    SyntheticShapesSegmentationDataset)
from torchok_tpu.data.datasets.examples.sop import SOP, TRIPLET_SOP
from torchok_tpu.data.datasets.examples.sweet_pepper import SweetPepper
from torchok_tpu.data.datasets.examples.coco import COCODetection, COCOSegmentation
