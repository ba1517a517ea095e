from torchok_tpu.data.datasets.detection.detection import DetectionDataset
