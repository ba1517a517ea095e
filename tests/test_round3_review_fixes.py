"""Regression tests for the round-3 self-review fixes:

- background checkpoint writer failures must surface (not report a missing
  checkpoint as saved),
- the async-save meta must snapshot metrics at capture time,
- the jitted device-transform closure must be reused across dataloader
  reloads with an identical transform config (no re-trace per reload).
"""
import json

import numpy as np
import pytest

import torchok_tpu  # noqa: F401
from torchok_tpu.callbacks import model_checkpoint as mc

from tests.test_train_loop import build, make_config


def test_background_writer_failure_raises(tmp_path, monkeypatch):
    class Boom(Exception):
        pass

    class FailingCkptr:
        def save(self, *a, **k):
            raise Boom("disk full")

    monkeypatch.setattr(mc.ocp, "PyTreeCheckpointer", FailingCkptr)
    state = {"params": np.zeros(3)}
    mc.save_train_state(str(tmp_path / "x.ckpt"), state, background=True)
    with pytest.raises(RuntimeError, match="background checkpoint write"):
        mc.wait_for_pending_saves()
    # the error queue must drain: a second join is clean
    mc.wait_for_pending_saves()


def test_async_meta_snapshots_metrics(tmp_path):
    """Mutating trainer.callback_metrics after an async save must not leak
    into the written meta (the writer thread serializes a snapshot)."""
    config = make_config(tmp_path, max_epochs=1)
    task, trainer = build(config)
    trainer.fit(task)

    cb = mc.ModelCheckpoint(dirpath=str(tmp_path / "ck"), save_async=True)
    cb.setup(trainer, task)
    trainer.callback_metrics = {"valid/Accuracy": 0.5}
    cb.on_epoch_end(trainer, task, logs={})
    # simulate the next epoch mutating the live dict while the writer runs
    trainer.callback_metrics["valid/Accuracy"] = 0.99
    mc.wait_for_pending_saves()
    meta = json.loads(
        (tmp_path / "ck" / cb._ckpt_name(trainer)).with_suffix(".ckpt")
        .joinpath("torchok_meta.json").read_text())
    assert meta["metrics"]["valid/Accuracy"] == 0.5


def test_device_fn_cached_across_reloads(tmp_path):
    config = make_config(tmp_path, max_epochs=1)
    task, trainer = build(config)
    trainer.task = task
    loaders = task.train_dataloader()
    fn1 = trainer._make_device_fn(loaders[0].dataset, train=True)
    # a reload rebuilds fresh dataset objects with the same transform config
    fresh = task.train_dataloader()
    fn2 = trainer._make_device_fn(fresh[0].dataset, train=True)
    assert fn1 is fn2
    # a different phase (or dtype) must NOT share the closure
    fn3 = trainer._make_device_fn(fresh[0].dataset, train=False)
    assert fn3 is not fn1
