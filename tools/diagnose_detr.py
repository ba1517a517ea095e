"""Diagnose the DETR toy-set mAP@50 plateau (~0.79 vs FCOS 0.977) from the
best checkpoint's actual predictions: is the gap duplicates (set prediction
failing to suppress), localization (IoU just under 0.5), classification
confusion, or missed objects?

Run AFTER a checkpointed train (configs/detection_toy_detr.yaml writes the
best ckpt to ~/.cache/torchok_tpu/toydet/ckpt):

    python tools/diagnose_detr.py             # CPU is fine (400 images)
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a (N,4), b (M,4) xyxy -> (N, M)."""
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-9), 0.0)


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from torchok_tpu.constructor import TASKS
    from torchok_tpu.constructor.config import load_config
    from torchok_tpu.constructor.config_structure import merge_structured
    from torchok_tpu.constructor.runner import create_trainer

    ckpt_dir = Path(os.environ.get(
        "TORCHOK_DETR_CKPT_DIR",
        str(Path.home() / ".cache/torchok_tpu/toydet/ckpt")))
    ckpts = sorted(ckpt_dir.glob("*.ckpt"), key=lambda p: p.stat().st_mtime)
    if not ckpts:
        print(f"no checkpoints under {ckpt_dir}; run the detr recipe first")
        return 1
    ckpt = str(ckpts[-1])
    print(f"checkpoint: {ckpt}")

    raw = load_config(str(REPO / "configs"), "detection_toy_detr",
                      ["+trainer.accelerator=cpu"])
    config = merge_structured(raw)
    params = config.task.get("params") or {}
    if hasattr(params, "to_dict"):
        params = params.to_dict()
    task = TASKS.get(config.task.name)(config, **params)
    trainer = create_trainer(config)
    trainer.task = task
    trainer._announce_mesh()
    loaders = task.val_dataloader()
    trainer._setup_state(task, ckpt)
    trainer._install_device_fns(loaders, train=False)
    eval_step = trainer._make_eval_step(task, with_loss=False)

    # per-image tallies at the mAP@50 matching protocol (greedy by score)
    tp, dup, wrong_cls, loc_miss, bg_fp, missed, n_gt = 0, 0, 0, 0, 0, 0, 0
    tp_scores, fp_scores = [], []
    records = []  # (score, is_tp, cls) over the whole set, for AP
    for loader in loaders:
        for batch in loader:
            out, _ = eval_step(trainer.state, batch)
            pb = np.asarray(out["prediction_bboxes"])   # (B, K, 4)
            ps = np.asarray(out["prediction_scores"])   # (B, K)
            pl = np.asarray(out["prediction_labels"])   # (B, K)
            gb = np.asarray(out["target"]["bboxes"])    # (B, G, 4) padded
            gl = np.asarray(out["target"]["labels"])    # (B, G) -1 padded
            for i in range(pb.shape[0]):
                valid_gt = gl[i] >= 0
                gtb, gtl = gb[i][valid_gt], gl[i][valid_gt]
                n_gt += len(gtb)
                order = np.argsort(-ps[i])
                used = np.zeros(len(gtb), bool)
                for j in order:
                    if ps[i, j] <= 1e-6:
                        continue
                    ious = iou_matrix(pb[i, j:j + 1], gtb)[0] if len(gtb) \
                        else np.zeros(0)
                    best = int(np.argmax(ious)) if len(ious) else -1
                    biou = float(ious[best]) if best >= 0 else 0.0
                    is_tp = False
                    if biou >= 0.5 and pl[i, j] == gtl[best]:
                        if not used[best]:
                            used[best] = True
                            tp += 1
                            is_tp = True
                            tp_scores.append(float(ps[i, j]))
                        else:
                            dup += 1
                            fp_scores.append(float(ps[i, j]))
                    elif biou >= 0.5:
                        wrong_cls += 1
                        fp_scores.append(float(ps[i, j]))
                    elif biou >= 0.1:
                        loc_miss += 1
                        fp_scores.append(float(ps[i, j]))
                    else:
                        bg_fp += 1
                        fp_scores.append(float(ps[i, j]))
                    records.append((float(ps[i, j]), is_tp))
                missed += int((~used).sum())

    print(f"\nGT boxes: {n_gt}")
    print(f"TP (IoU>=.5, right class, first match):  {tp}")
    print(f"missed GT:                               {missed}")
    print(f"FP duplicates (2nd+ match on same GT):   {dup}")
    print(f"FP wrong class (IoU>=.5):                {wrong_cls}")
    print(f"FP localization (0.1<=IoU<0.5):          {loc_miss}")
    print(f"FP background (IoU<0.1):                 {bg_fp}")
    if tp_scores:
        print(f"TP score: mean {np.mean(tp_scores):.3f} "
              f"min {np.min(tp_scores):.3f}")
    if fp_scores:
        print(f"FP score: mean {np.mean(fp_scores):.3f} "
              f"max {np.max(fp_scores):.3f} "
              f"p90 {np.percentile(fp_scores, 90):.3f}")

    # AP@50 from the same records (all classes pooled), plus the oracle
    # "what if every FP below the worst TP score were gone" bound
    records.sort(key=lambda r: -r[0])
    tps = np.array([r[1] for r in records], float)
    cum_tp = np.cumsum(tps)
    cum_fp = np.cumsum(1.0 - tps)
    recall = cum_tp / max(n_gt, 1)
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-9)
    # 101-point interpolated AP
    ap = 0.0
    for r in np.linspace(0, 1, 101):
        mask = recall >= r
        ap += (precision[mask].max() if mask.any() else 0.0) / 101
    print(f"\npooled AP@50 (diagnostic protocol): {ap:.3f}")
    print(f"max recall reached: {recall[-1] if len(recall) else 0:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
