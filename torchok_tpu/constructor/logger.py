"""Logger backends (reference: torchok/constructor/logger.py:192-240).

Output-directory convention matches the reference: ``log_dir/experiment_name/
timestamp`` (reference logger.py:52-73). TensorBoard and CSV are native;
MLFlowLogger[X] write a real mlruns file-store tree (no mlflow client
needed — utils/mlflow_store.py) including MLFlowLoggerX artifact upload;
Wandb writes a real offline run directory and Neptune a real offline
operation-journal container; their *online* modes need clients/network
absent here and RAISE unless ``allow_fallback: true`` degrades them to
their offline writers.
"""
from __future__ import annotations

import csv
import datetime
import json
import logging
import os
from pathlib import Path
from typing import Any, Dict, Optional

from torchok_tpu.constructor import LOGGERS
from torchok_tpu.constructor.config import ConfigNode

logger = logging.getLogger(__name__)


class BaseLogger:
    def __init__(self, log_dir: str, experiment_name: str = "default",
                 timestamp: Optional[str] = None, **params):
        if timestamp is None:
            timestamp = datetime.datetime.now().strftime("%Y-%m-%d/%H-%M-%S")
        self.save_dir = Path(log_dir) / experiment_name / timestamp
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.params = params

    @property
    def log_dir(self) -> str:
        return str(self.save_dir)

    def log_hyperparams(self, hparams) -> None:
        try:
            data = hparams.to_dict() if isinstance(hparams, ConfigNode) else dict(hparams)
            with open(self.save_dir / "hparams.json", "w") as f:
                json.dump(data, f, indent=2, default=str)
        except Exception as e:  # noqa: BLE001
            logger.warning("Failed to dump hparams: %s", e)

    def log_metrics(self, metrics: Dict[str, float], step: int = 0) -> None:
        raise NotImplementedError

    def finalize(self, status: str) -> None:
        pass


@LOGGERS.register_class
class CSVLogger(BaseLogger):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._path = self.save_dir / "metrics.csv"
        self._fields = ["step"]
        self._rows = []

    def log_metrics(self, metrics: Dict[str, float], step: int = 0) -> None:
        row = {"step": step, **metrics}
        for k in row:
            if k not in self._fields:
                self._fields.append(k)
        self._rows.append(row)
        with open(self._path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fields)
            writer.writeheader()
            writer.writerows(self._rows)

    def finalize(self, status: str) -> None:
        with open(self.save_dir / "status.txt", "w") as f:
            f.write(status)


@LOGGERS.register_class
class TensorBoardLogger(BaseLogger):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        from tensorboardX import SummaryWriter
        self.writer = SummaryWriter(logdir=str(self.save_dir))

    def log_metrics(self, metrics: Dict[str, float], step: int = 0) -> None:
        for k, v in metrics.items():
            try:
                self.writer.add_scalar(k, float(v), global_step=step)
            except (TypeError, ValueError):
                pass

    def log_hyperparams(self, hparams) -> None:
        super().log_hyperparams(hparams)

    def finalize(self, status: str) -> None:
        self.writer.flush()
        self.writer.close()


def _flatten(d: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


@LOGGERS.register_class
class MLFlowLogger(BaseLogger):
    """MLflow tracking over the file-store protocol (pure filesystem, no
    mlflow client). Reference: torchok/constructor/logger.py registers
    Lightning's MLFlowLogger; remote ``http(s)`` tracking URIs need a client
    and network and raise here unless ``allow_fallback: true`` downgrades
    them to a local store under ``log_dir``.

    The store root is ``tracking_uri`` (``file:`` URI or plain path) when
    given, else ``<log_dir>/mlruns`` (mirrors the reference default
    ``save_dir='./mlruns'``).
    """

    def __init__(self, log_dir: str, experiment_name: str = "default",
                 timestamp: Optional[str] = None, tracking_uri: Optional[str] = None,
                 run_name: Optional[str] = None, tags: Optional[Dict] = None,
                 prefix: str = "", allow_fallback: bool = False,
                 artifact_location: Optional[str] = None, run_id: Optional[str] = None,
                 save_dir: Optional[str] = None, **params):
        super().__init__(log_dir, experiment_name, timestamp, **params)
        from torchok_tpu.utils.mlflow_store import MLFlowFileStore

        if tracking_uri and tracking_uri.startswith(("http://", "https://")):
            if not allow_fallback:
                raise ValueError(
                    f"{type(self).__name__}: remote tracking_uri "
                    f"{tracking_uri!r} needs the mlflow client and network "
                    "access, which this environment does not have. Point "
                    "tracking_uri at a local path (or file: URI), or set "
                    "allow_fallback: true to track into a local file store.")
            logger.warning("%s: remote tracking_uri %r unavailable; tracking "
                           "into local file store instead", type(self).__name__,
                           tracking_uri)
            tracking_uri = None
        if tracking_uri:
            root = tracking_uri[len("file:"):] if tracking_uri.startswith("file:") \
                else tracking_uri
        else:
            root = str(Path(save_dir) if save_dir else Path(log_dir) / "mlruns")
        self.prefix = prefix
        tags = dict(tags) if tags else None
        self.store = MLFlowFileStore(root, experiment_name=experiment_name,
                                     run_name=run_name, tags=tags, run_id=run_id)

    @property
    def run_id(self) -> str:
        return self.store.run_id

    def log_hyperparams(self, hparams) -> None:
        super().log_hyperparams(hparams)  # keep the JSON dump alongside
        try:
            data = hparams.to_dict() if isinstance(hparams, ConfigNode) else dict(hparams)
        except Exception as e:  # noqa: BLE001
            logger.warning("Failed to flatten hparams for MLflow: %s", e)
            return
        for k, v in _flatten(data).items():
            self.store.log_param(k, v)

    def log_metrics(self, metrics: Dict[str, float], step: int = 0) -> None:
        for k, v in metrics.items():
            try:
                self.store.log_metric(self.prefix + k, float(v), step=step)
            except (TypeError, ValueError):
                pass

    def finalize(self, status: str) -> None:
        self.store.finalize(status.upper() if isinstance(status, str) else "FINISHED")


@LOGGERS.register_class
class MLFlowLoggerX(MLFlowLogger):
    """MLFlowLogger that also uploads checkpoint/export artifacts at finalize
    (reference MLFlowLoggerX, torchok/constructor/logger.py:111-168 — there
    ``*.ckpt``/``*.onnx``; here the Orbax ``.ckpt`` dirs and ``.stablehlo``
    exports the TPU engine writes, plus any ``.onnx`` files)."""

    ARTIFACT_GLOBS = ("**/*.ckpt", "**/*.onnx", "**/*.stablehlo")

    def finalize(self, status: str) -> None:
        for pattern in self.ARTIFACT_GLOBS:
            for path in sorted(self.save_dir.glob(pattern)):
                try:
                    self.store.log_artifact(str(path))
                except OSError as e:
                    logger.warning("artifact upload failed for %s: %s", path, e)
        super().finalize(status)


@LOGGERS.register_class
class WandbLogger(BaseLogger):
    """Weights & Biases offline-run directory writer (reference registers
    Lightning's WandbLogger, torchok/constructor/logger.py:192-240).

    No wandb client or network exists here, so this writes the *documented
    JSON side* of wandb's offline run layout directly::

        <save_dir>/wandb/offline-run-<ts>-<id>/files/
            config.yaml            # flattened hparams, wandb config style
            wandb-history.jsonl    # one JSON per log_metrics call (_step/_timestamp)
            wandb-summary.json     # last value per key
            wandb-metadata.json    # run metadata (program, start time, state)

    ``wandb sync`` additionally needs the binary ``.wandb`` protobuf record
    the client produces; that part cannot be fabricated faithfully without
    the client, so syncing an offline run produced here requires re-logging.
    ``mode: online`` (or ``offline: false``) therefore raises unless
    ``allow_fallback: true`` downgrades it to this offline writer.
    """

    def __init__(self, log_dir: str, experiment_name: str = "default",
                 timestamp: Optional[str] = None, project: Optional[str] = None,
                 name: Optional[str] = None, save_dir: Optional[str] = None,
                 offline: bool = True, mode: str = "offline",
                 allow_fallback: bool = False, id: Optional[str] = None,
                 tags: Optional[Any] = None, **params):
        super().__init__(log_dir, experiment_name, timestamp, **params)
        if mode == "online" or not offline:
            if not allow_fallback:
                raise ValueError(
                    "WandbLogger: online mode needs the wandb client and "
                    "network access, which this environment does not have. "
                    "Use mode: offline (default), or set allow_fallback: "
                    "true to record an offline run directory instead.")
            logger.warning("WandbLogger: online mode unavailable; recording "
                           "an offline run directory instead (allow_fallback)")
        import secrets
        run_id = id or secrets.token_hex(4)
        stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        root = Path(save_dir) if save_dir else self.save_dir
        self.run_dir = root / "wandb" / f"offline-run-{stamp}-{run_id}"
        self.files_dir = self.run_dir / "files"
        self.files_dir.mkdir(parents=True, exist_ok=True)
        self.run_id = run_id
        self.project = project or experiment_name
        self._summary: Dict[str, Any] = {}
        self._t0 = datetime.datetime.now()
        meta = {
            "program": "torchok_tpu",
            "project": self.project,
            "run_id": run_id,
            "name": name or run_id,
            "startedAt": self._t0.isoformat(),
            "tags": list(tags) if tags else [],
            "state": "running",
        }
        with open(self.files_dir / "wandb-metadata.json", "w") as f:
            json.dump(meta, f, indent=2)

    def log_hyperparams(self, hparams) -> None:
        super().log_hyperparams(hparams)
        try:
            data = hparams.to_dict() if isinstance(hparams, ConfigNode) else dict(hparams)
        except Exception as e:  # noqa: BLE001
            logger.warning("Failed to flatten hparams for wandb config: %s", e)
            return
        # wandb config.yaml convention: each key wraps its value in {value:}
        lines = ["wandb_version: 1", ""]
        for k, v in sorted(_flatten(data).items()):
            lines.append(f"{k}:")
            lines.append(f"  value: {json.dumps(v, default=str)}")
        (self.files_dir / "config.yaml").write_text("\n".join(lines) + "\n")

    def log_metrics(self, metrics: Dict[str, float], step: int = 0) -> None:
        row: Dict[str, Any] = {"_step": int(step),
                               "_timestamp": datetime.datetime.now().timestamp(),
                               "_runtime": (datetime.datetime.now()
                                            - self._t0).total_seconds()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                continue
        with open(self.files_dir / "wandb-history.jsonl", "a") as f:
            f.write(json.dumps(row) + "\n")
        self._summary.update(row)
        with open(self.files_dir / "wandb-summary.json", "w") as f:
            json.dump(self._summary, f)

    def finalize(self, status: str) -> None:
        meta_path = self.files_dir / "wandb-metadata.json"
        try:
            meta = json.loads(meta_path.read_text())
        except (OSError, ValueError):
            meta = {}
        meta["state"] = "finished" if status in ("success", "FINISHED") else str(status)
        meta["finishedAt"] = datetime.datetime.now().isoformat()
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=2)


@LOGGERS.register_class
class NeptuneLogger(BaseLogger):
    """Neptune offline-container writer (reference registers Lightning's
    NeptuneLogger, torchok/constructor/logger.py:227-233, which forwards
    params to ``neptune.init_run``).

    The neptune 1.x client in ``mode: offline`` records runs locally as an
    operation journal under ``.neptune/offline/run__<uuid>/`` — one JSON
    operation per attribute write — to be uploaded later with
    ``neptune sync``. No neptune client or network exists here, so this
    writes that journal shape directly::

        <save_dir>/.neptune/offline/run__<uuid>/
            data-1.log       # one JSON op/line: AssignString|AssignFloat|LogFloats
            run.json         # container metadata (sys/id, state, timestamps)

    ``neptune sync`` additionally validates against the client's internal
    sqlite bookkeeping, so uploading a run recorded here requires re-logging
    through the real client; the journal is for local inspection/parsing.
    Online modes (``async``/``sync``) need the client+network and raise
    unless ``allow_fallback: true`` degrades them to this offline writer.
    """

    def __init__(self, log_dir: str, experiment_name: str = "default",
                 timestamp: Optional[str] = None, project: Optional[str] = None,
                 name: Optional[str] = None, mode: str = "offline",
                 api_key: Optional[str] = None, allow_fallback: bool = False,
                 tags: Optional[Any] = None, **params):
        params.pop("secrets_path", None)
        super().__init__(log_dir, experiment_name, timestamp, **params)
        if mode not in ("offline", "debug"):
            if not allow_fallback:
                raise ValueError(
                    "NeptuneLogger: mode '%s' needs the neptune client and "
                    "network access, which this environment does not have. "
                    "Use mode: offline (default), or set allow_fallback: "
                    "true to record an offline container instead." % mode)
            logger.warning("NeptuneLogger: mode '%s' unavailable; recording "
                           "an offline container instead (allow_fallback)",
                           mode)
        import uuid
        self.run_uuid = str(uuid.uuid4())
        self.project = project or experiment_name
        self.container_dir = (self.save_dir / ".neptune" / "offline"
                              / f"run__{self.run_uuid}")
        self.container_dir.mkdir(parents=True, exist_ok=True)
        self._journal = self.container_dir / "data-1.log"
        self._t0 = datetime.datetime.now()
        self._meta = {
            "sys/id": f"OFFLINE-{self.run_uuid[:8]}",
            "project": self.project,
            "name": name or self.run_uuid[:8],
            "state": "running",
            "creation_time": self._t0.isoformat(),
            "tags": list(tags) if tags else [],
        }
        self._write_meta()
        self._op("AssignString", ["sys", "name"], self._meta["name"])

    def _write_meta(self) -> None:
        with open(self.container_dir / "run.json", "w") as f:
            json.dump(self._meta, f, indent=2)

    def _op(self, op: str, path, value) -> None:
        record = {"type": op, "path": list(path),
                  "ts": datetime.datetime.now().timestamp()}
        if op == "LogFloats":
            record["values"] = value
        else:
            record["value"] = value
        with open(self._journal, "a") as f:
            f.write(json.dumps(record) + "\n")

    def log_hyperparams(self, hparams) -> None:
        super().log_hyperparams(hparams)
        try:
            data = hparams.to_dict() if isinstance(hparams, ConfigNode) else dict(hparams)
        except Exception as e:  # noqa: BLE001
            logger.warning("Failed to flatten hparams for neptune: %s", e)
            return
        for k, v in sorted(_flatten(data).items()):
            path = ["parameters"] + k.split(".")
            if isinstance(v, bool):
                self._op("AssignBool", path, v)
            elif isinstance(v, (int, float)):
                self._op("AssignFloat", path, float(v))
            else:
                self._op("AssignString", path, json.dumps(v, default=str)
                         if not isinstance(v, str) else v)

    def log_metrics(self, metrics: Dict[str, float], step: int = 0) -> None:
        ts = datetime.datetime.now().timestamp()
        for k, v in metrics.items():
            try:
                val = float(v)
            except (TypeError, ValueError):
                continue
            self._op("LogFloats", k.split("/"),
                     [{"value": val, "step": int(step), "ts": ts}])

    def finalize(self, status: str) -> None:
        self._meta["state"] = ("idle" if status in ("success", "FINISHED")
                               else str(status))
        self._meta["end_time"] = datetime.datetime.now().isoformat()
        self._write_meta()


def create_logger(logger_params) -> Optional[BaseLogger]:
    """Build a logger backend from config (reference logger.py:192-240)."""
    if not logger_params:
        return None
    name = logger_params.name
    kwargs = dict(
        log_dir=logger_params.log_dir,
        experiment_name=logger_params.get("experiment_name", "default"),
        timestamp=logger_params.get("timestamp"),
    )
    extra = logger_params.get("params") or {}
    if hasattr(extra, "to_dict"):
        extra = extra.to_dict()
    kwargs.update(extra)
    return LOGGERS.get(name)(**kwargs)
