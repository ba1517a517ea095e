from torchok_tpu.export.stablehlo import StableHLOModel, export_task_model
