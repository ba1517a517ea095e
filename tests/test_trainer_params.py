"""Lightning-surface TrainerParams semantics (reference:
torchok/constructor/config_structure.py:136-171 — the 35-field pl.Trainer
mirror). Every accepted field must do what its name promises; fields that
are inert on TPU are documented in TrainerParams' docstring instead."""
import numpy as np
import pytest

import torchok_tpu  # noqa: F401
from torchok_tpu.engine.trainer import Trainer, _parse_max_time

from tests.test_train_loop import build, make_config


# ---------------------------------------------------------------------------
# max_time
# ---------------------------------------------------------------------------
def test_parse_max_time_formats():
    assert _parse_max_time(None) is None
    assert _parse_max_time("00:01:30:00") == 5400.0
    assert _parse_max_time({"hours": 1, "seconds": 30}) == 3630.0
    assert _parse_max_time(90) == 90.0
    import datetime
    assert _parse_max_time(datetime.timedelta(minutes=2)) == 120.0
    with pytest.raises(ValueError, match="DD:HH:MM:SS"):
        _parse_max_time("01:30:00")


def test_max_time_stops_training(tmp_path):
    """A 1s budget cannot survive 5 epochs (first compile alone exceeds it):
    training must hard-stop mid-epoch with the step counter advanced."""
    config = make_config(tmp_path, max_epochs=5,
                         trainer_extra={"max_time": {"seconds": 1}})
    task, trainer = build(config)
    trainer.fit(task)
    assert trainer.global_step >= 1
    # 5 epochs x 4 batches = 20 steps would complete without the budget
    assert trainer.global_step < 20
    assert trainer.current_epoch < 4


# ---------------------------------------------------------------------------
# gradient_clip_algorithm
# ---------------------------------------------------------------------------
def test_gradient_clip_algorithm_validated(tmp_path):
    config = make_config(tmp_path,
                         trainer_extra={"gradient_clip_val": 1.0,
                                        "gradient_clip_algorithm": "nope"})
    with pytest.raises(ValueError, match="norm.*value"):
        build(config)


def test_gradient_clip_by_value_trains(tmp_path):
    config = make_config(tmp_path, max_epochs=1,
                         trainer_extra={"gradient_clip_val": 0.01,
                                        "gradient_clip_algorithm": "value"})
    task, trainer = build(config)
    trainer.fit(task)
    assert np.isfinite(trainer.callback_metrics["train/loss"])


# ---------------------------------------------------------------------------
# min_steps
# ---------------------------------------------------------------------------
def test_min_steps_defers_early_stop(tmp_path):
    stopper = [{"name": "EarlyStopping",
                "params": {"monitor": "valid/loss", "mode": "min",
                           "patience": 0, "min_delta": 1e9}}]
    config = make_config(tmp_path, max_epochs=3, extra_callbacks=stopper)
    task, trainer = build(config)
    trainer.fit(task)
    stopped_at = trainer.current_epoch
    assert stopped_at < 2  # the impossible min_delta stops training early

    config = make_config(tmp_path, max_epochs=3, extra_callbacks=stopper,
                         trainer_extra={"min_steps": 100000})
    task, trainer = build(config)
    trainer.fit(task)
    assert trainer.current_epoch == 2  # floor not reached: all epochs run


# ---------------------------------------------------------------------------
# val_check_interval
# ---------------------------------------------------------------------------
class _ValCounter:
    """Records every validation-epoch-end callback invocation."""
    instances = []

    def __init__(self):
        self.count = 0
        _ValCounter.instances.append(self)

    def __getattr__(self, name):
        if name == "on_validation_epoch_end":
            def hook(trainer, task, logs):
                self.count += 1
            return hook
        if name == "should_stop":
            return lambda trainer: False
        return lambda *a, **k: None


def test_val_check_interval_mid_epoch(tmp_path, monkeypatch):
    config = make_config(tmp_path, max_epochs=1,
                         trainer_extra={"val_check_interval": 2,
                                        "num_sanity_val_steps": 0})
    task, trainer = build(config)
    counter = _ValCounter()
    trainer.callbacks.append(counter)
    trainer.fit(task)
    # 4 train batches, interval 2: one mid-epoch validation at step 2 (the
    # step-4 boundary is the epoch's last batch and defers to the regular
    # end-of-epoch validation) => 2 total
    assert counter.count == 2


# ---------------------------------------------------------------------------
# overfit_batches
# ---------------------------------------------------------------------------
def test_overfit_batches_limits_and_validates_on_train(tmp_path):
    config = make_config(tmp_path, max_epochs=2,
                         trainer_extra={"overfit_batches": 1})
    task, trainer = build(config)
    trainer.fit(task)
    assert trainer.limit_train_batches == 1
    assert trainer.limit_val_batches == 1
    assert trainer.global_step == 2  # 1 batch x 2 epochs
    assert "valid/Accuracy" in trainer.callback_metrics


# ---------------------------------------------------------------------------
# enable_checkpointing / enable_model_summary / barebones
# ---------------------------------------------------------------------------
def test_enable_checkpointing_installs_default(tmp_path):
    from torchok_tpu.callbacks.model_checkpoint import ModelCheckpoint
    config = make_config(tmp_path,
                         trainer_extra={"enable_checkpointing": True})
    _, trainer = build(config)
    assert any(isinstance(cb, ModelCheckpoint) for cb in trainer.callbacks)


def test_enable_checkpointing_false_conflicts_with_callback(tmp_path):
    config = make_config(
        tmp_path,
        extra_callbacks=[{"name": "ModelCheckpoint",
                          "params": {"dirpath": str(tmp_path / "c")}}],
        trainer_extra={"enable_checkpointing": False})
    with pytest.raises(ValueError, match="enable_checkpointing"):
        build(config)


def test_barebones_strips_logger_and_checkpointing(tmp_path):
    from torchok_tpu.callbacks.model_checkpoint import ModelCheckpoint
    config = make_config(
        tmp_path, max_epochs=1,
        extra_callbacks=[{"name": "ModelCheckpoint",
                          "params": {"dirpath": str(tmp_path / "c")}}],
        trainer_extra={"barebones": True})
    task, trainer = build(config)
    assert trainer.logger is None
    assert not any(isinstance(cb, ModelCheckpoint) for cb in trainer.callbacks)
    trainer.fit(task)  # the stripped loop still trains
    assert np.isfinite(trainer.callback_metrics["train/loss"])


# ---------------------------------------------------------------------------
# use_distributed_sampler
# ---------------------------------------------------------------------------
def test_use_distributed_sampler_flag_controls_process_shard(tmp_path):
    config = make_config(tmp_path)
    task, _ = build(config)
    assert task.train_dataloader()[0].process_shard is True
    assert task.val_dataloader()[0].process_shard is False

    config = make_config(tmp_path,
                         trainer_extra={"use_distributed_sampler": False})
    task, _ = build(config)
    assert task.train_dataloader()[0].process_shard is False


# ---------------------------------------------------------------------------
# reload_dataloaders_every_n_epochs
# ---------------------------------------------------------------------------
def test_reload_dataloaders_every_n_epochs(tmp_path):
    config = make_config(tmp_path, max_epochs=3,
                         trainer_extra={"reload_dataloaders_every_n_epochs": 1})
    task, trainer = build(config)
    calls = []
    orig = task.train_dataloader

    def counted():
        calls.append(1)
        return orig()

    task.train_dataloader = counted
    trainer.fit(task)
    # initial build + reloads at epoch starts 1 and 2
    assert len(calls) == 3
    assert trainer.current_epoch == 2


# ---------------------------------------------------------------------------
# async checkpoint writes
# ---------------------------------------------------------------------------
def test_save_async_checkpoint_roundtrip(tmp_path):
    """save_async=True moves serialization/IO to a writer thread; the ckpt
    must be complete after fit (on_fit_end joins) and resumable."""
    ckpt_dir = str(tmp_path / "ckpts")
    config = make_config(tmp_path, max_epochs=2, extra_callbacks=[
        {"name": "ModelCheckpoint",
         "params": {"dirpath": ckpt_dir, "save_last": True,
                    "save_async": True}},
    ])
    task, trainer = build(config)
    trainer.fit(task)
    from pathlib import Path
    last = Path(ckpt_dir) / "last.ckpt"
    assert last.exists()

    config2 = make_config(tmp_path, max_epochs=3)
    task2, trainer2 = build(config2)
    trainer2.fit(task2, ckpt_path=str(last))
    assert trainer2.current_epoch == 2  # resumed past the 2 saved epochs
