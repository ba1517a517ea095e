from torchok_tpu.data.datasets.representation.validation import RetrievalDataset
from torchok_tpu.data.datasets.representation.unsupervised_contrastive_dataset import (
    UnsupervisedContrastiveDataset,
)
