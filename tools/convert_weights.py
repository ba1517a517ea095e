#!/usr/bin/env python
"""Convert a torch/timm backbone checkpoint into the local pretrained cache.

Usage:
    python tools/convert_weights.py --name resnet18 --checkpoint resnet18.pth
    python tools/convert_weights.py --name swinv2_tiny_window8_256 \
        --checkpoint swin.pth --image-size 256 --strict

Writes ``<cache>/<name>.msgpack`` (cache dir: $TORCHOK_TPU_WEIGHTS or
~/.cache/torchok_tpu/weights) in the format ``pretrained=True`` reads.
The reference resolves the same weights through timm URL configs
(reference: torchok/models/backbones/resnet.py:566-569); with no network
egress the user supplies the .pth and this tool does the layout conversion
(conv OIHW->HWIO, linear transpose, BN stats -> batch_stats collection).
"""
import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--name", required=True,
                        help="registered backbone variant name, e.g. resnet18")
    parser.add_argument("--checkpoint", required=True, help="path to .pth file")
    parser.add_argument("--out", default=None,
                        help="output .msgpack path (default: the weights cache)")
    parser.add_argument("--image-size", type=int, default=224,
                        help="init image size (attention tables depend on it)")
    parser.add_argument("--strict", action="store_true",
                        help="fail on any unmatched parameter")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")

    import jax
    jax.config.update("jax_platforms", "cpu")  # conversion never needs the TPU

    from torchok_tpu.utils.torch_convert import convert_checkpoint
    out, report = convert_checkpoint(
        args.name, args.checkpoint, out_path=args.out,
        image_size=args.image_size, strict=args.strict)
    print(f"{out}: {report.summary()}")
    if report.missing:
        print("missing (left at random init):")
        for k in report.missing:
            print("  ", k)
    if report.unused:
        print("unused torch keys:")
        for k in report.unused:
            print("  ", k)
    return 1 if (args.strict and (report.missing or report.unused)) else 0


if __name__ == "__main__":
    raise SystemExit(main())
