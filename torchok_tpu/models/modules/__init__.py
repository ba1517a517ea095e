from torchok_tpu.models.modules.bricks.convbnact import ConvBnAct
from torchok_tpu.models.modules.bricks.mlp import Mlp
from torchok_tpu.models.modules.blocks.scse import SCSEModule
from torchok_tpu.models.modules.blocks.se import SEModule, EcaModule
