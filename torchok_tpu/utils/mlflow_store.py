"""Pure-Python MLflow FileStore writer.

Implements the on-disk layout the ``mlflow`` FileStore backend reads
(``mlflow ui --backend-store-uri file:<root>``), with no mlflow client
dependency: per-experiment ``meta.yaml``, per-run ``meta.yaml``, one file per
metric with ``<timestamp_ms> <value> <step>`` lines, one file per param/tag,
and an ``artifacts/`` directory.

Reference equivalent: torchok/constructor/logger.py:111-168 (MLFlowLoggerX
over the mlflow client); here the client is replaced by direct file-store
writes so local tracking works in a network-free environment.
"""
from __future__ import annotations

import getpass
import logging
import shutil
import time
import uuid
from pathlib import Path
from typing import Any, Dict, Optional

import yaml

logger = logging.getLogger(__name__)

# mlflow.entities.RunStatus integer codes (FileStore stores the int)
RUN_STATUS = {"RUNNING": 1, "SCHEDULED": 2, "FINISHED": 3, "FAILED": 4,
              "KILLED": 5, "SUCCESS": 3}  # Lightning passes "success"/"failed"

_INVALID = set('<>:"|?*')


def _sanitize(key: str) -> str:
    """Metric/param keys become file paths; '/' is allowed (nested dirs),
    anything path-hostile is replaced."""
    return "".join("_" if c in _INVALID else c for c in key)


def _now_ms() -> int:
    return int(time.time() * 1000)


class MLFlowFileStore:
    """Writer for one run in an mlruns file-store tree."""

    def __init__(self, root: str, experiment_name: str = "default",
                 run_name: Optional[str] = None,
                 tags: Optional[Dict[str, Any]] = None,
                 run_id: Optional[str] = None):
        self.root = Path(root).absolute()
        self.root.mkdir(parents=True, exist_ok=True)
        self.experiment_id = self._ensure_experiment(experiment_name)
        self.run_id = run_id or uuid.uuid4().hex
        self.run_name = run_name or f"run-{self.run_id[:8]}"
        self.run_dir = self.root / self.experiment_id / self.run_id
        for sub in ("metrics", "params", "tags", "artifacts"):
            (self.run_dir / sub).mkdir(parents=True, exist_ok=True)
        self._start_time = _now_ms()
        self._write_run_meta(status="RUNNING", end_time=None)
        self.set_tag("mlflow.runName", self.run_name)
        try:
            self.set_tag("mlflow.user", getpass.getuser())
        except Exception:  # noqa: BLE001 — no passwd entry in some containers
            pass
        for k, v in (tags or {}).items():
            self.set_tag(k, v)

    # -- experiment ----------------------------------------------------------
    def _ensure_experiment(self, name: str) -> str:
        # reuse an existing experiment of the same name, else next free id
        existing_ids = []
        for d in self.root.iterdir() if self.root.exists() else []:
            meta = d / "meta.yaml"
            if d.is_dir() and meta.exists():
                data = yaml.safe_load(meta.read_text()) or {}
                if data.get("name") == name:
                    return str(data.get("experiment_id", d.name))
                try:
                    existing_ids.append(int(d.name))
                except ValueError:
                    pass
        exp_id = str(max(existing_ids) + 1 if existing_ids else 0)
        exp_dir = self.root / exp_id
        exp_dir.mkdir(parents=True, exist_ok=True)
        now = _now_ms()
        self._dump_yaml(exp_dir / "meta.yaml", {
            "artifact_location": exp_dir.as_uri(),
            "creation_time": now,
            "experiment_id": exp_id,
            "last_update_time": now,
            "lifecycle_stage": "active",
            "name": name,
        })
        return exp_id

    # -- run meta -------------------------------------------------------------
    def _write_run_meta(self, status: str, end_time: Optional[int]) -> None:
        self._dump_yaml(self.run_dir / "meta.yaml", {
            "artifact_uri": (self.run_dir / "artifacts").as_uri(),
            "end_time": end_time,
            "entry_point_name": "",
            "experiment_id": self.experiment_id,
            "lifecycle_stage": "active",
            "run_id": self.run_id,
            "run_name": self.run_name,
            "run_uuid": self.run_id,
            "source_name": "",
            "source_type": 4,  # LOCAL
            "source_version": "",
            "start_time": self._start_time,
            "status": RUN_STATUS.get(status, 1),
            "tags": [],
            "user_id": "unknown",
        })

    @staticmethod
    def _dump_yaml(path: Path, data: Dict[str, Any]) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(data, f, default_flow_style=False)

    # -- logging --------------------------------------------------------------
    def log_metric(self, key: str, value: float, step: int = 0,
                   timestamp: Optional[int] = None) -> None:
        path = self.run_dir / "metrics" / _sanitize(key)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "a") as f:
            f.write(f"{timestamp or _now_ms()} {float(value)} {int(step)}\n")

    def log_param(self, key: str, value: Any) -> None:
        if len(str(value)) > 250:
            logger.warning("MLflow params are capped at 250 chars; "
                           "discarding %s", key)
            return
        path = self.run_dir / "params" / _sanitize(key)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(str(value))

    def set_tag(self, key: str, value: Any) -> None:
        path = self.run_dir / "tags" / _sanitize(key)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(str(value))

    def log_artifact(self, local_path: str,
                     artifact_path: Optional[str] = None) -> None:
        src = Path(local_path)
        dst_dir = self.run_dir / "artifacts"
        if artifact_path:
            dst_dir = dst_dir / artifact_path
        dst_dir.mkdir(parents=True, exist_ok=True)
        dst = dst_dir / src.name
        if src.is_dir():
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy2(src, dst)

    def finalize(self, status: str = "FINISHED") -> None:
        self._write_run_meta(status=status, end_time=_now_ms())
