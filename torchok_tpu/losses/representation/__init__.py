from torchok_tpu.losses.representation.pairwise import (
    BasePairwiseLoss, ContrastiveLoss, GeneralPairWeightingLoss,
)
from torchok_tpu.losses.representation.unsupervised import NT_XentLoss
