from torchok_tpu.models.base import BaseBackbone, BaseModel, BackboneWrapper
import torchok_tpu.models.backbones  # noqa: F401
import torchok_tpu.models.poolings  # noqa: F401
import torchok_tpu.models.heads  # noqa: F401
import torchok_tpu.models.necks  # noqa: F401
