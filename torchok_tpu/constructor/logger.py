"""Logger backends (reference: torchok/constructor/logger.py:192-240).

Output-directory convention matches the reference: ``log_dir/experiment_name/
timestamp`` (reference logger.py:52-73). TensorBoard and CSV ship now; the
MLFlow/W&B/Neptune backends of the reference need client libraries absent in
this environment — their registry names resolve to the CSV fallback with a
warning so configs still run.
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


def _register_fallback(name: str):
    @LOGGERS.register_class(name=name)
    class _Fallback(CSVLogger):  # noqa: N801
        def __init__(self, *args, **kwargs):
            logger.warning("%s backend is unavailable in this environment; "
                           "falling back to CSVLogger", name)
            kwargs.pop("secrets_path", None)
            super().__init__(*args, **kwargs)
    _Fallback.__name__ = name
    return _Fallback


for _name in ("MLFlowLogger", "MLFlowLoggerX", "WandbLogger", "NeptuneLogger"):
    _register_fallback(_name)


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
