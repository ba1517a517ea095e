from torchok_tpu.parallel.mesh import build_mesh, fsdp_sharding, replicated_sharding
