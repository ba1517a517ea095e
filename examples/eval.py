"""Evaluate a trained recipe and export a serving artifact (script
equivalent of the reference's examples/notebooks/Eval.ipynb, which embeds
the val set, computes retrieval metrics, and saves a torch.jit trace — here
the artifact is a StableHLO export with a polymorphic batch dimension).

    python examples/eval.py --config configs/representation_arcface_shapes.yaml \
        --ckpt <run_dir>/checkpoints/last.ckpt --export /tmp/arcface.stablehlo
"""
import argparse
import pathlib
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default="configs/representation_arcface_shapes.yaml")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint to load (defaults to fresh init)")
    ap.add_argument("--export", default=None,
                    help="optional StableHLO output path")
    ap.add_argument("--overrides", nargs="*", default=[])
    args = ap.parse_args()

    from torchok_tpu.constructor import TASKS
    from torchok_tpu.constructor.config import load_config
    from torchok_tpu.constructor.runner import create_trainer

    cfg_path = pathlib.Path(args.config)
    config = load_config(cfg_path.parent, cfg_path.stem, args.overrides)

    # most recipes only define VALID; evaluate that split as the test pass
    # (what the reference notebook does by embedding the val set by hand)
    if not config.data.get("TEST"):
        config.data["TEST"] = config.data.VALID
        for m in (config.get("metrics") or []):
            phases = m.get("phases")
            if phases and "VALID" in phases and "TEST" not in phases:
                m["phases"] = list(phases) + ["TEST"]

    task_params = config.task.get("params") or {}
    if hasattr(task_params, "to_dict"):
        task_params = task_params.to_dict()
    task = TASKS.get(config.task.name)(config, **task_params)
    trainer = create_trainer(config)

    # retrieval recipes run the on-TPU index + recall/precision meters here
    logs = trainer.test(task, ckpt_path=args.ckpt)
    for key in sorted(logs):
        print(f"{key} = {logs[key]:.4f}")

    if args.export:
        from torchok_tpu.export.stablehlo import export_task_model
        variables = {"params": trainer.state.params}
        if trainer.state.batch_stats:
            variables["batch_stats"] = trainer.state.batch_stats
        out = export_task_model(task, variables, args.export)
        print(f"exported {out}")


if __name__ == "__main__":
    main()
