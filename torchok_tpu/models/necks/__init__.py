from torchok_tpu.models.necks.classification.hrnet import HRNetClassificationNeck
from torchok_tpu.models.necks.segmentation.hrnet import HRNetSegmentationNeck
from torchok_tpu.models.necks.segmentation.unet import UnetNeck
import torchok_tpu.models.necks.detection  # noqa: F401
