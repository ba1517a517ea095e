"""Visual sanity check of a segmentation dataset (script equivalent of the
reference's examples/notebooks/CheckSegmentationDataset.ipynb): builds the
TRAIN dataset from a recipe YAML and writes an image/mask grid PNG.

    python examples/check_segmentation_dataset.py \
        --config configs/segmentation_shapes.yaml --out /tmp/seg_check.png
"""
import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/segmentation_shapes.yaml")
    ap.add_argument("--out", default="/tmp/seg_check.png")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # no TPU needed to look at data
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import pathlib

    from torchok_tpu.constructor.config import load_config
    from torchok_tpu.constructor.constructor import Constructor

    cfg_path = pathlib.Path(args.config)
    config = load_config(cfg_path.parent, cfg_path.stem)
    ds_cfg = config.data.TRAIN[0].dataset
    dataset = Constructor._create_dataset(ds_cfg)
    print(f"{ds_cfg.name}: {len(dataset)} samples")

    fig, axs = plt.subplots(2, args.n, figsize=(2.2 * args.n, 5))
    for i in range(args.n):
        sample = dataset.get_raw(args.start + i)
        axs[0, i].imshow(sample["image"].astype("uint8"))
        axs[0, i].set_title(f"#{args.start + i}", fontsize=8)
        axs[1, i].imshow(sample["mask"], interpolation="nearest")
        for ax in (axs[0, i], axs[1, i]):
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
