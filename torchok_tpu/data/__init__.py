import torchok_tpu.data.transforms  # noqa: F401
import torchok_tpu.data.datasets.classification  # noqa: F401
import torchok_tpu.data.datasets.examples  # noqa: F401
import torchok_tpu.data.datasets.segmentation  # noqa: F401
import torchok_tpu.data.datasets.representation  # noqa: F401
import torchok_tpu.data.samplers  # noqa: F401
from torchok_tpu.data.loader import DataLoader  # noqa: F401
import torchok_tpu.data.datasets.detection  # noqa: F401
