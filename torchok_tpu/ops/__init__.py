from torchok_tpu.ops.common import DropPath, drop_path, trunc_normal_init
from torchok_tpu.ops.image import resize_bilinear, adaptive_avg_pool, adaptive_max_pool
