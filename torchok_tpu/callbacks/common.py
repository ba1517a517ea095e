"""Common callbacks (reference: torchok/callbacks/__init__.py:11-23 —
Lightning re-registrations rebuilt natively)."""
from __future__ import annotations

import logging
import time
from typing import Dict, Optional

import jax
import numpy as np

from torchok_tpu.constructor import CALLBACKS
from torchok_tpu.engine.callbacks import Callback

logger = logging.getLogger(__name__)


@CALLBACKS.register_class
class EarlyStopping(Callback):
    def __init__(self, monitor: str, min_delta: float = 0.0, patience: int = 3,
                 mode: str = "min", **_):
        self.monitor = monitor
        self.min_delta = min_delta
        self.patience = patience
        self.mode = mode
        self.best: Optional[float] = None
        self.wait = 0
        self._stop = False

    def on_epoch_end(self, trainer, task, logs: Dict[str, float]) -> None:
        if self.monitor not in logs:
            return
        value = float(logs[self.monitor])
        improved = (self.best is None or
                    (value < self.best - self.min_delta if self.mode == "min"
                     else value > self.best + self.min_delta))
        if improved:
            self.best = value
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                self._stop = True
                logger.info("EarlyStopping: %s did not improve for %d epochs",
                            self.monitor, self.patience)

    def should_stop(self, trainer) -> bool:
        return self._stop


@CALLBACKS.register_class
class FinalizeLogger(Callback):
    """Flush logger with KILLED/FAILED status on any exception
    (reference: torchok/callbacks/finalize_logger.py:7-14)."""

    def on_exception(self, trainer, task, exception: BaseException) -> None:
        if trainer.logger is not None:
            status = "KILLED" if isinstance(exception, KeyboardInterrupt) else "FAILED"
            trainer.logger.finalize(status)


@CALLBACKS.register_class
class LearningRateMonitor(Callback):
    def __init__(self, logging_interval: str = "epoch", **_):
        self.logging_interval = logging_interval

    def on_epoch_end(self, trainer, task, logs: Dict[str, float]) -> None:
        if trainer.logger is not None:
            trainer.logger.log_metrics({"lr": trainer.current_lr()},
                                       step=trainer.global_step)


@CALLBACKS.register_class
class TQDMProgressBar(Callback):
    """Console progress reporting (tqdm-free, per-epoch summary lines)."""

    def __init__(self, refresh_rate: int = 1, **_):
        self.refresh_rate = refresh_rate
        self._t0 = None

    def on_train_epoch_start(self, trainer, task) -> None:
        self._t0 = time.perf_counter()

    def on_epoch_end(self, trainer, task, logs: Dict[str, float]) -> None:
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        parts = [f"epoch {trainer.current_epoch}", f"{dt:.1f}s"]
        for k, v in sorted(logs.items()):
            if isinstance(v, (int, float)) and not k.endswith("epoch_time_s"):
                parts.append(f"{k}={v:.4f}")
        print(" | ".join(parts), flush=True)


@CALLBACKS.register_class
class RichProgressBar(TQDMProgressBar):
    pass


@CALLBACKS.register_class
class ModelSummary(Callback):
    def __init__(self, max_depth: int = 1, **_):
        self.max_depth = max_depth

    def on_fit_start(self, trainer, task) -> None:
        params = trainer.state.params
        count = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
        print(f"Model parameters: {count / 1e6:.2f}M", flush=True)


@CALLBACKS.register_class
class RichModelSummary(ModelSummary):
    pass


@CALLBACKS.register_class
class Timer(Callback):
    def __init__(self, duration: Optional[str] = None, interval: str = "epoch", **_):
        self.duration_s = self._parse(duration) if duration else None
        self._start = None
        self._stop = False

    @staticmethod
    def _parse(duration: str) -> float:
        parts = [float(p) for p in str(duration).split(":")]
        while len(parts) < 4:
            parts.insert(0, 0.0)
        d, h, m, s = parts[-4:]
        return ((d * 24 + h) * 60 + m) * 60 + s

    def on_fit_start(self, trainer, task) -> None:
        self._start = time.monotonic()

    def on_epoch_end(self, trainer, task, logs) -> None:
        if self.duration_s and time.monotonic() - self._start > self.duration_s:
            self._stop = True

    def should_stop(self, trainer) -> bool:
        return self._stop


@CALLBACKS.register_class
class DeviceStatsMonitor(Callback):
    def on_epoch_end(self, trainer, task, logs) -> None:
        if trainer.logger is None:
            return
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            trainer.logger.log_metrics(
                {"device/bytes_in_use": stats.get("bytes_in_use", 0),
                 "device/peak_bytes_in_use": stats.get("peak_bytes_in_use", 0)},
                step=trainer.global_step)
        except Exception:  # noqa: BLE001 — stats are best-effort per backend
            pass


@CALLBACKS.register_class
class GradientAccumulationScheduler(Callback):
    """Accepted for config parity; static accumulation is configured via
    trainer.accumulate_grad_batches (dynamic scheduling not yet supported)."""

    def __init__(self, scheduling: Optional[dict] = None, **_):
        self.scheduling = scheduling or {}

    def setup(self, trainer, task) -> None:
        if self.scheduling:
            first = sorted(self.scheduling.items())[0]
            logger.warning("GradientAccumulationScheduler: dynamic scheduling not "
                           "supported; using accumulate_grad_batches=%s", first[1])
