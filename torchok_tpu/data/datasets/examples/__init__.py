from torchok_tpu.data.datasets.examples.cifar import CIFAR10, CIFAR100
from torchok_tpu.data.datasets.examples.synthetic import SyntheticClassificationDataset
