from torchok_tpu.metrics.base import Metric
from torchok_tpu.metrics.metrics_manager import MetricsManager, MetricWithUtils
import torchok_tpu.metrics.classification  # noqa: F401
import torchok_tpu.metrics.regression  # noqa: F401
import torchok_tpu.metrics.representation  # noqa: F401
import torchok_tpu.metrics.image  # noqa: F401
import torchok_tpu.metrics.detection  # noqa: F401
import torchok_tpu.metrics.representation_torchmetrics  # noqa: F401
