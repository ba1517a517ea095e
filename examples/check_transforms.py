"""Visual sanity check of a transform pipeline (script equivalent of the
reference's examples/notebooks/CheckTransforms.ipynb): shows raw samples
next to the same samples after the recipe's TRAIN transform/augment chain.

    python examples/check_transforms.py \
        --config configs/classification_shapes.yaml --out /tmp/tf_check.png
"""
import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/classification_shapes.yaml")
    ap.add_argument("--out", default="/tmp/tf_check.png")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--n", type=int, default=6)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from torchok_tpu.constructor.config import load_config
    from torchok_tpu.constructor.constructor import Constructor

    cfg_path = pathlib.Path(args.config)
    config = load_config(cfg_path.parent, cfg_path.stem)
    ds_cfg = config.data.TRAIN[0].dataset
    dataset = Constructor._create_dataset(ds_cfg)
    names = [t["name"] for t in (list(ds_cfg.get("transform") or [])
                                 + list(ds_cfg.get("augment") or []))]
    print(f"{ds_cfg.name}: {len(dataset)} samples; chain: {names}")

    def to_img(arr):
        arr = np.asarray(arr, np.float32)
        if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
            arr = arr.transpose(1, 2, 0)  # CHW tensor output -> HWC
        lo, hi = arr.min(), arr.max()
        return (arr - lo) / (hi - lo + 1e-6)

    fig, axs = plt.subplots(2, args.n, figsize=(2.2 * args.n, 5))
    for i in range(args.n):
        raw = dataset.get_raw(args.start + i)
        cooked = dataset[args.start + i]
        axs[0, i].imshow(raw["image"].astype("uint8"))
        axs[0, i].set_title(f"raw #{args.start + i}", fontsize=8)
        axs[1, i].imshow(to_img(cooked["image"]))
        axs[1, i].set_title("transformed", fontsize=8)
        for ax in (axs[0, i], axs[1, i]):
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
