from torchok_tpu.losses.segmentation.dice import DiceLoss
