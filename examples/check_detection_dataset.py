"""Visual sanity check of a detection dataset (script equivalent of the
reference's examples/notebooks/CheckDetectionDataset.ipynb): builds the
TRAIN dataset from a recipe YAML and writes a PNG grid with the raw bboxes
drawn on each image.

    python tools/gen_toy_detection.py          # once, generates the toy set
    python examples/check_detection_dataset.py \
        --config configs/detection_toy_fcos.yaml --out /tmp/det_check.png
"""
import argparse
import pathlib
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/detection_toy_fcos.yaml")
    ap.add_argument("--out", default="/tmp/det_check.png")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.patches as patches
    import matplotlib.pyplot as plt

    from torchok_tpu.constructor.config import load_config
    from torchok_tpu.constructor.constructor import Constructor

    cfg_path = pathlib.Path(args.config)
    config = load_config(cfg_path.parent, cfg_path.stem)
    ds_cfg = config.data.TRAIN[0].dataset
    dataset = Constructor._create_dataset(ds_cfg)
    print(f"{ds_cfg.name}: {len(dataset)} samples "
          f"(bbox_format={ds_cfg.params.bbox_format})")

    cols = min(args.n, 4)
    rows = (args.n + cols - 1) // cols
    fig, axs = plt.subplots(rows, cols, figsize=(3.2 * cols, 3.2 * rows),
                            squeeze=False)
    for i in range(args.n):
        ax = axs[i // cols][i % cols]
        sample = dataset.get_raw(args.start + i)
        ax.imshow(sample["image"].astype("uint8"))
        for bbox, label in zip(sample["bboxes"], sample["label"]):
            # get_raw normalizes every bbox_format to pascal xyxy
            x1, y1, x2, y2 = bbox[:4]
            ax.add_patch(patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                           linewidth=1.5, edgecolor="red",
                                           facecolor="none"))
            ax.text(x1, y1 - 2, str(int(label)), color="red", fontsize=8)
        ax.set_title(f"#{args.start + i}", fontsize=8)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
