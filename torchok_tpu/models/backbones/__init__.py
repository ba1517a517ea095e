import torchok_tpu.models.backbones.resnet  # noqa: F401
import torchok_tpu.models.backbones.efficientnet  # noqa: F401
import torchok_tpu.models.backbones.mobilenetv3  # noqa: F401
import torchok_tpu.models.backbones.vit  # noqa: F401
import torchok_tpu.models.backbones.swin  # noqa: F401
import torchok_tpu.models.backbones.hrnet  # noqa: F401
