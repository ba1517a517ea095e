"""Generate a deterministic toy detection dataset (bright rectangles on
noise, 2 classes: filled rectangle vs ring) under
~/.cache/torchok_tpu/toydet — stands in for COCO on a box with no egress."""
import sys; sys.path.insert(0, "/root/repo")
import json
from pathlib import Path

import cv2
import numpy as np
import pandas as pd


def gen(split: str, n: int, seed: int):
    root = Path.home() / ".cache/torchok_tpu/toydet" / split
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        img = rng.integers(0, 70, size=(96, 96, 3), dtype=np.uint8)
        boxes, labels = [], []
        for _ in range(int(rng.integers(1, 4))):
            w, h = int(rng.integers(16, 36)), int(rng.integers(16, 36))
            x0 = int(rng.integers(2, 94 - w))
            y0 = int(rng.integers(2, 94 - h))
            cls = int(rng.integers(0, 2))
            color = (int(rng.integers(160, 255)),) * 3
            if cls == 0:
                cv2.rectangle(img, (x0, y0), (x0 + w, y0 + h), color, -1)
            else:
                cv2.rectangle(img, (x0, y0), (x0 + w, y0 + h), color, 3)
            boxes.append([x0, y0, w, h])
            labels.append(cls)
        name = f"{split}_{i}.png"
        cv2.imwrite(str(root / name), img)
        rows.append({"image_path": name, "bbox": json.dumps(boxes),
                     "label": json.dumps(labels)})
    pd.DataFrame(rows).to_csv(root / "ann.csv", index=False)
    print(split, n, "->", root)


if __name__ == "__main__":
    gen("train", 2000, 1)
    gen("valid", 400, 2)
