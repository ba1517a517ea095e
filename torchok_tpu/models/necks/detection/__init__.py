from torchok_tpu.models.necks.detection.fpn import FPN
from torchok_tpu.models.necks.detection.pyramids import (
    BFP, ChannelMapper, CTResNetNeck, DilatedEncoder, DyHead, FPG, FPN_CARAFE,
    HRFPN, NASFCOS_FPN, NASFPN, PAFPN, RFP, SSDNeck, YOLOV3Neck, YOLOXPAFPN)
