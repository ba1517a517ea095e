from torchok_tpu.models.necks.classification.hrnet import HRNetClassificationNeck
from torchok_tpu.models.necks.segmentation.hrnet import HRNetSegmentationNeck
from torchok_tpu.models.necks.segmentation.unet import UnetNeck
