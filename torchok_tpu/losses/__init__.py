from torchok_tpu.losses.base import JointLoss
import torchok_tpu.losses.common  # noqa: F401 — registers the torch.nn-equivalent zoo
import torchok_tpu.losses.representation  # noqa: F401
import torchok_tpu.losses.segmentation  # noqa: F401
import torchok_tpu.losses.detection  # noqa: F401
