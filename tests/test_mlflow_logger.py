"""MLflow file-store logger tests (reference MLFlowLoggerX parity:
torchok/constructor/logger.py:111-168)."""
from pathlib import Path

import pytest
import yaml

from torchok_tpu.constructor import LOGGERS
import torchok_tpu  # noqa: F401


def test_mlflow_file_store_layout(tmp_path):
    lg = LOGGERS.get("MLFlowLogger")(
        log_dir=str(tmp_path), experiment_name="exp1", run_name="r1")
    lg.log_hyperparams({"optimizer": {"name": "Adam", "lr": 1e-3}})
    lg.log_metrics({"train/loss": 1.5, "valid/Accuracy": 0.25}, step=0)
    lg.log_metrics({"train/loss": 1.1}, step=1)
    lg.finalize("success")

    root = tmp_path / "mlruns"
    exp_dirs = [d for d in root.iterdir() if d.is_dir()]
    assert len(exp_dirs) == 1
    exp_meta = yaml.safe_load((exp_dirs[0] / "meta.yaml").read_text())
    assert exp_meta["name"] == "exp1"
    assert exp_meta["lifecycle_stage"] == "active"

    run_dirs = [d for d in exp_dirs[0].iterdir() if d.is_dir()]
    assert len(run_dirs) == 1
    run = run_dirs[0]
    run_meta = yaml.safe_load((run / "meta.yaml").read_text())
    assert run_meta["status"] == 3  # FINISHED
    assert run_meta["end_time"] is not None
    assert run_meta["run_name"] == "r1"

    # metric files: "<ts_ms> <value> <step>" lines, nested by '/'
    loss_lines = (run / "metrics/train/loss").read_text().strip().splitlines()
    assert len(loss_lines) == 2
    ts, val, step = loss_lines[1].split()
    assert float(val) == pytest.approx(1.1) and step == "1"
    assert (run / "metrics/valid/Accuracy").exists()

    # params flattened with dots
    assert (run / "params/optimizer.name").read_text() == "Adam"
    assert (run / "tags/mlflow.runName").read_text() == "r1"


def test_mlflow_same_experiment_reused(tmp_path):
    a = LOGGERS.get("MLFlowLogger")(log_dir=str(tmp_path), experiment_name="e")
    b = LOGGERS.get("MLFlowLogger")(log_dir=str(tmp_path), experiment_name="e")
    c = LOGGERS.get("MLFlowLogger")(log_dir=str(tmp_path), experiment_name="e2")
    assert a.store.experiment_id == b.store.experiment_id
    assert c.store.experiment_id != a.store.experiment_id
    # two runs inside one experiment dir
    exp_dir = Path(a.store.root) / a.store.experiment_id
    runs = [d for d in exp_dir.iterdir() if d.is_dir()]
    assert len(runs) == 2


def test_mlflowx_uploads_ckpt_artifacts(tmp_path):
    lg = LOGGERS.get("MLFlowLoggerX")(
        log_dir=str(tmp_path), experiment_name="expx")
    # engine writes Orbax .ckpt dirs + .stablehlo exports under log_dir
    ckpt = Path(lg.log_dir) / "checkpoints" / "epoch=0-step=4.ckpt"
    ckpt.mkdir(parents=True)
    (ckpt / "payload.bin").write_bytes(b"\x00\x01")
    hlo = Path(lg.log_dir) / "checkpoints" / "best.stablehlo"
    hlo.mkdir(parents=True)
    (hlo / "module.mlir").write_text("module {}")
    lg.finalize("success")

    art = Path(lg.store.run_dir) / "artifacts"
    assert (art / "epoch=0-step=4.ckpt" / "payload.bin").exists()
    assert (art / "best.stablehlo" / "module.mlir").exists()


def test_remote_uri_raises_without_fallback(tmp_path):
    with pytest.raises(ValueError, match="allow_fallback"):
        LOGGERS.get("MLFlowLogger")(
            log_dir=str(tmp_path), tracking_uri="https://mlflow.example.com")
    lg = LOGGERS.get("MLFlowLogger")(
        log_dir=str(tmp_path), tracking_uri="https://mlflow.example.com",
        allow_fallback=True)
    assert (tmp_path / "mlruns").exists()


def test_neptune_offline_container(tmp_path):
    """NeptuneLogger writes a neptune-1.x-style offline operation journal:
    .neptune/offline/run__<uuid>/{data-1.log, run.json}."""
    import json

    lg = LOGGERS.get("NeptuneLogger")(log_dir=str(tmp_path), project="proj",
                                      name="run1")
    lg.log_hyperparams({"task": {"name": "ClassificationTask"}, "seed": 7,
                        "use_ema": True})
    lg.log_metrics({"train/loss": 2.0, "lr": 0.1}, step=1)
    lg.log_metrics({"train/loss": 1.5}, step=2)
    lg.finalize("success")

    runs = list((lg.save_dir / ".neptune" / "offline").glob("run__*"))
    assert len(runs) == 1
    ops = [json.loads(line) for line in
           (runs[0] / "data-1.log").read_text().splitlines()]
    loss_ops = [o for o in ops if o["path"] == ["train", "loss"]]
    assert [o["type"] for o in loss_ops] == ["LogFloats", "LogFloats"]
    assert [(o["values"][0]["value"], o["values"][0]["step"])
            for o in loss_ops] == [(2.0, 1), (1.5, 2)]
    by_path = {tuple(o["path"]): o for o in ops}
    assert by_path[("parameters", "task", "name")]["value"] == "ClassificationTask"
    assert by_path[("parameters", "seed")]["type"] == "AssignFloat"
    assert by_path[("parameters", "use_ema")]["type"] == "AssignBool"
    meta = json.loads((runs[0] / "run.json").read_text())
    assert meta["state"] == "idle" and meta["project"] == "proj"
    assert meta["sys/id"].startswith("OFFLINE-")


def test_neptune_online_mode_raises_without_fallback(tmp_path):
    with pytest.raises(ValueError, match="allow_fallback"):
        LOGGERS.get("NeptuneLogger")(log_dir=str(tmp_path), mode="async")
    lg = LOGGERS.get("NeptuneLogger")(log_dir=str(tmp_path), mode="async",
                                      allow_fallback=True)
    lg.log_metrics({"m": 1.0}, step=0)  # degraded to the offline writer
    assert list((lg.save_dir / ".neptune" / "offline").glob("run__*"))


def test_wandb_offline_run_directory(tmp_path):
    """WandbLogger writes the documented JSON side of a wandb offline run:
    config.yaml / wandb-history.jsonl / wandb-summary.json / metadata."""
    import json

    lg = LOGGERS.get("WandbLogger")(log_dir=str(tmp_path), project="proj",
                                    name="run1")
    lg.log_hyperparams({"task": {"name": "ClassificationTask"}, "seed": 7})
    lg.log_metrics({"train/loss": 2.0, "lr": 0.1}, step=1)
    lg.log_metrics({"train/loss": 1.5}, step=2)
    lg.finalize("success")

    runs = list((lg.save_dir / "wandb").glob("offline-run-*"))
    assert len(runs) == 1
    files = runs[0] / "files"
    history = [json.loads(line) for line in
               (files / "wandb-history.jsonl").read_text().splitlines()]
    assert [h["_step"] for h in history] == [1, 2]
    assert history[0]["train/loss"] == 2.0 and history[0]["lr"] == 0.1
    summary = json.loads((files / "wandb-summary.json").read_text())
    assert summary["train/loss"] == 1.5  # last value wins
    assert summary["lr"] == 0.1
    cfg = (files / "config.yaml").read_text()
    assert "task.name:" in cfg and 'value: "ClassificationTask"' in cfg
    meta = json.loads((files / "wandb-metadata.json").read_text())
    assert meta["state"] == "finished" and meta["project"] == "proj"


def test_wandb_online_mode_raises_without_fallback(tmp_path):
    with pytest.raises(ValueError, match="allow_fallback"):
        LOGGERS.get("WandbLogger")(log_dir=str(tmp_path), mode="online")
    lg = LOGGERS.get("WandbLogger")(log_dir=str(tmp_path), mode="online",
                                    allow_fallback=True)
    lg.log_metrics({"m": 1.0}, step=0)  # degraded to the offline writer
