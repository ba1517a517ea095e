import torchok_tpu.optim.optimizers  # noqa: F401
import torchok_tpu.optim.schedulers  # noqa: F401
