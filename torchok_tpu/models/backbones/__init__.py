import torchok_tpu.models.backbones.resnet  # noqa: F401
