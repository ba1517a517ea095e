from torchok_tpu.parallel.mesh import (build_mesh, fsdp_sharding,
                                       get_current_mesh, init_distributed,
                                       replicated_sharding, set_current_mesh)
