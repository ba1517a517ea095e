from torchok_tpu.models.poolings.classification.pooling import Pooling
from torchok_tpu.models.poolings.classification.linear import PoolingLinear
