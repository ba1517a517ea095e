"""ModelCheckpoint callback — Orbax-backed (reference re-registers
Lightning's ModelCheckpoint, torchok/callbacks/__init__.py:18).

Supports monitor/save_top_k/mode/save_last with the Lightning filename
convention (``epoch={n}-step={s}.ckpt`` directories, Orbax pytrees inside).
"""
from __future__ import annotations

import json
import logging
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from torchok_tpu.constructor import CALLBACKS
from torchok_tpu.engine.callbacks import Callback

logger = logging.getLogger(__name__)


_PENDING_SAVES: List = []
_WRITER_ERRORS: List[BaseException] = []


def wait_for_pending_saves() -> None:
    """Block until every background checkpoint write has finished.

    Re-raises the first writer-thread failure — a checkpoint that silently
    failed to write must not be reported as saved (resume would then start
    from a missing or partial directory).
    """
    for t in list(_PENDING_SAVES):
        t.join()
    _PENDING_SAVES.clear()
    if _WRITER_ERRORS:
        err = _WRITER_ERRORS[0]
        _WRITER_ERRORS.clear()
        raise RuntimeError("background checkpoint write failed") from err


def save_train_state(path: str, state, meta: Optional[Dict] = None,
                     background: bool = False) -> None:
    """Write a TrainState checkpoint (Orbax pytree + meta json).

    With ``background=True`` the device→host transfer still happens inline
    (the train step DONATES its state buffers, so device arrays must not be
    referenced across steps — engine invariant), but serialization and disk
    IO run on a writer thread so the train loop resumes immediately.
    Writers are serialized with each other; :func:`wait_for_pending_saves`
    (called by ModelCheckpoint at fit end and by restore) joins them.
    """
    path = Path(path).absolute()

    if jax.process_count() > 1:
        # multi-host: global arrays are only PARTIALLY addressable per host
        # (fsdp shards live across hosts), so device_get would raise. Hand
        # Orbax the sharded jax.Arrays — it coordinates per-host shard
        # writes into the (shared-filesystem) checkpoint dir. Synchronous:
        # background threads cannot participate in cross-host collectives.
        from jax.experimental import multihost_utils
        if jax.process_index() == 0 and path.exists():
            shutil.rmtree(path)
        multihost_utils.sync_global_devices("torchok_ckpt_rmtree")
        ocp.PyTreeCheckpointer().save(path, state)
        if meta and jax.process_index() == 0:
            with open(path / "torchok_meta.json", "w") as f:
                json.dump(meta, f)
        return

    host_state = jax.device_get(state)

    def _write() -> None:
        if path.exists():
            shutil.rmtree(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, host_state)
        if meta:
            with open(path / "torchok_meta.json", "w") as f:
                json.dump(meta, f)

    def _write_bg() -> None:
        try:
            _write()
        except BaseException as exc:  # noqa: BLE001 — surfaced at next join
            _WRITER_ERRORS.append(exc)

    if background:
        import threading
        wait_for_pending_saves()  # one writer at a time, in order
        t = threading.Thread(target=_write_bg, name="ckpt-writer", daemon=True)
        t.start()
        _PENDING_SAVES.append(t)
    else:
        _write()


def restore_train_state(path: str, target_state) -> Tuple[Any, Dict]:
    """Restore a TrainState saved by :func:`save_train_state`.

    Weights-only checkpoints (``save_weights_only=True``) were written with
    ``opt_state=None``; restoring them against a full template would fail on
    a tree-structure mismatch, so the optimizer state is detected as absent
    and the template's freshly initialized ``opt_state`` is kept instead.
    """
    wait_for_pending_saves()  # a background write may still be in flight
    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    # multi-host: restore straight into the sharded template (device_get on
    # partially-addressable global arrays would raise; Orbax reads each
    # host's shards from the shared checkpoint dir)
    multihost = jax.process_count() > 1
    template = target_state if multihost else jax.device_get(target_state)

    def _restore(item):
        if multihost:
            # without ArrayRestoreArgs Orbax hands back full host numpy
            # arrays — every host would materialize the whole (fsdp-sharded)
            # tree and the restored state would lose the shardings the
            # donated train step was traced for
            restore_args = ocp.checkpoint_utils.construct_restore_args(item)
            return ckptr.restore(path, item=item, restore_args=restore_args)
        return ckptr.restore(path, item=item)

    saved_structure = ckptr.metadata(path)
    weights_only = (
        hasattr(template, "opt_state")
        and getattr(template, "opt_state", None) is not None
        and _tree_lacks_opt_state(saved_structure)
    )
    if weights_only:
        restored = _restore(template.replace(opt_state=None))
        restored = restored.replace(opt_state=target_state.opt_state)
        logger.info("restored weights-only checkpoint from %s; optimizer "
                    "state freshly initialized", path)
    else:
        restored = _restore(template)
    meta = {}
    meta_path = path / "torchok_meta.json"
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
    return restored, meta


def _tree_lacks_opt_state(saved_metadata) -> bool:
    """True when the on-disk checkpoint has no opt_state subtree."""
    tree = saved_metadata
    for attr in ("item_metadata", "tree"):  # StepMetadata -> TreeMetadata -> dict
        tree = getattr(tree, attr, tree)
    try:
        opt = tree["opt_state"]
    except (KeyError, TypeError, IndexError):
        return True
    if opt is None:
        return True
    leaves = jax.tree_util.tree_leaves(opt)
    return len(leaves) == 0


@CALLBACKS.register_class
class ModelCheckpoint(Callback):
    def __init__(self, dirpath: Optional[str] = None, filename: Optional[str] = None,
                 monitor: Optional[str] = None, save_top_k: int = 1,
                 save_last: bool = False, mode: str = "min",
                 save_weights_only: bool = False, every_n_epochs: int = 1,
                 export_to_onnx: bool = False, save_async: bool = False, **_):
        self.dirpath = dirpath
        self.filename = filename
        self.monitor = monitor
        self.save_top_k = save_top_k
        self.save_last = save_last
        self.mode = mode
        self.save_weights_only = save_weights_only
        self.every_n_epochs = max(1, every_n_epochs)
        # TPU extension: serialization + disk IO on a writer thread (the
        # device->host pull stays inline — the step donates state buffers)
        self.save_async = save_async
        self.best_k: List[Tuple[float, str]] = []  # (score, path)
        self.best_model_path: Optional[str] = None
        self.best_model_score: Optional[float] = None

    def setup(self, trainer, task) -> None:
        if self.dirpath is None:
            base = trainer.logger.log_dir if trainer.logger else "checkpoints"
            self.dirpath = str(Path(base) / "checkpoints")
        Path(self.dirpath).mkdir(parents=True, exist_ok=True)

    def _is_better(self, score: float, ref: float) -> bool:
        return score < ref if self.mode == "min" else score > ref

    def _ckpt_name(self, trainer) -> str:
        if self.filename:
            return self.filename.format(epoch=trainer.current_epoch,
                                        step=trainer.global_step)
        return f"epoch={trainer.current_epoch}-step={trainer.global_step}"

    def _save(self, trainer, task, path: str) -> None:
        state = trainer.state
        if self.save_weights_only:
            state = state.replace(opt_state=None)
        save_train_state(path, state, meta={
            "epoch": trainer.current_epoch,
            "global_step": trainer.global_step,
            "monitor": self.monitor,
            # snapshot: the live dict keeps mutating while an async writer
            # serializes (epoch N+1 val metrics would leak into epoch N's
            # meta, and a mid-dump insert breaks json.dump)
            "metrics": {k: float(v) for k, v in trainer.callback_metrics.items()},
        }, background=self.save_async)
        self.on_checkpoint_saved(trainer, task, path)

    def on_checkpoint_saved(self, trainer, task, path: str) -> None:
        """Hook for subclasses (e.g. StableHLO export on best checkpoints)."""

    def on_fit_end(self, trainer, task) -> None:
        wait_for_pending_saves()

    def on_exception(self, trainer, task, exc) -> None:
        wait_for_pending_saves()  # do not lose an in-flight write on failure

    def on_epoch_end(self, trainer, task, logs: Dict[str, float]) -> None:
        if (trainer.current_epoch + 1) % self.every_n_epochs != 0:
            return
        if self.monitor is not None and self.monitor in logs and self.save_top_k != 0:
            score = float(logs[self.monitor])
            path = str(Path(self.dirpath) / (self._ckpt_name(trainer) + ".ckpt"))
            if self.save_top_k < 0 or len(self.best_k) < self.save_top_k:
                self._save(trainer, task, path)
                self.best_k.append((score, path))
            else:
                worst_idx = int(np.argmin([s for s, _ in self.best_k])) \
                    if self.mode == "max" else int(np.argmax([s for s, _ in self.best_k]))
                worst_score, worst_path = self.best_k[worst_idx]
                if self._is_better(score, worst_score):
                    self._save(trainer, task, path)
                    if Path(worst_path).exists():
                        shutil.rmtree(worst_path, ignore_errors=True)
                    stale_export = Path(worst_path).with_suffix(".stablehlo")
                    if stale_export.exists():
                        shutil.rmtree(stale_export, ignore_errors=True)
                    self.best_k[worst_idx] = (score, path)
            best_idx = int(np.argmax([s for s, _ in self.best_k])) \
                if self.mode == "max" else int(np.argmin([s for s, _ in self.best_k]))
            self.best_model_score, self.best_model_path = self.best_k[best_idx]
        elif self.monitor is None:
            path = str(Path(self.dirpath) / (self._ckpt_name(trainer) + ".ckpt"))
            self._save(trainer, task, path)
            self.best_model_path = path
        if self.save_last:
            self._save(trainer, task, str(Path(self.dirpath) / "last.ckpt"))
