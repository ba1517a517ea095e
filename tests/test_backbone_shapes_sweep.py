"""Full-registry backbone shape sweep via ``jax.eval_shape`` (no FLOPs).

Round-1 review: only ~26 of 319 variants were ever instantiated; a
mis-specified channel table in the rest would pass CI. This sweeps EVERY
registered backbone name and asserts the declared ``out_channels`` /
``out_encoder_channels`` match the traced pyramid.
Reference pattern: tests/additional_tests/models/backbones/test_backbone.py
:10-67 (there: one forward per family on real tensors; here: abstract eval
of all variants).

Round-3 wall-time fix (the full trace was ~20 of the suite's ~35 min): the
traced pyramid for every variant is committed in
``tests/data/backbone_shapes.json`` keyed by a hash of the model sources
(torchok_tpu/models + ops). While the hash matches, each variant verifies
against the cached trace in milliseconds and only a deterministic
``_LIVE_SAMPLE``-variant subsample re-traces live; when model code changes,
the whole sweep re-traces live (slow) until the table is regenerated with
``python tools/gen_backbone_shape_table.py``. ``TORCHOK_SWEEP_FULL=1``
forces the live trace; ``TORCHOK_SWEEP_SAMPLE=N`` subsamples as before.
"""
import datetime
import json
import os
import pathlib
import random

import jax
import jax.numpy as jnp
import pytest

from torchok_tpu.constructor import BACKBONES
from torchok_tpu.utils.source_hash import model_source_hash

ALL_BACKBONES = sorted(BACKBONES.list_models())
_sample = int(os.environ.get("TORCHOK_SWEEP_SAMPLE", "0"))
if _sample:
    rng = random.Random(20260816)
    ALL_BACKBONES = sorted(rng.sample(ALL_BACKBONES,
                                      min(_sample, len(ALL_BACKBONES))))

_TABLE_PATH = pathlib.Path(__file__).resolve().parent / "data" \
    / "backbone_shapes.json"
_LIVE_SAMPLE = 8

_table = None
if not os.environ.get("TORCHOK_SWEEP_FULL") and _TABLE_PATH.exists():
    _candidate = json.loads(_TABLE_PATH.read_text())
    if _candidate.get("source_hash") == model_source_hash():
        _table = _candidate["entries"]
# rotating live subsample: even in cached mode a few variants re-trace for
# real. Seeded by the calendar day so the window actually rotates across CI
# runs (a fixed seed would live-trace the same 8 variants forever) while
# staying deterministic within a day for flake triage. To reproduce a
# failing day's window later (bisection), pin TORCHOK_SWEEP_LIVE_SEED to
# the ordinal printed in the failure.
_live_seed = int(os.environ.get("TORCHOK_SWEEP_LIVE_SEED",
                                datetime.date.today().toordinal()))
_live = set(random.Random(_live_seed).sample(
    ALL_BACKBONES, min(_LIVE_SAMPLE, len(ALL_BACKBONES))))


def _input_hw(model) -> int:
    # Transformer families pin their resolution; CNN pyramids are
    # resolution-agnostic — 64 keeps stride-32 outputs non-degenerate.
    return int(getattr(model, "img_size", 64))


def _trace(model, hw):
    x = jax.ShapeDtypeStruct((1, hw, hw, 3), jnp.float32)

    # One combined abstract trace; `train`/`method` bound statically
    # (eval_shape abstracts every positional arg, and a traced bool breaks
    # `not train` in Dropout arguments).
    def init_and_features(rng_, xx):
        variables = model.init(rng_, xx, False)
        return model.apply(variables, xx, False,
                           method=model.forward_features)

    feats = jax.eval_shape(init_and_features, jax.random.PRNGKey(0), x)
    return [tuple(f.shape) for f in feats]


def test_shape_table_covers_registry():
    if _table is None:
        pytest.skip("live-trace mode (no table / stale hash / forced)")
    missing = set(BACKBONES.list_models()) - set(_table)
    stale = set(_table) - set(BACKBONES.list_models())
    assert not missing, f"regenerate tools/gen_backbone_shape_table.py: {missing}"
    assert not stale, f"table has unregistered names: {stale}"


@pytest.mark.parametrize("name", ALL_BACKBONES)
def test_backbone_eval_shape(name):
    model = BACKBONES.get(name)()
    hw = _input_hw(model)
    if _table is not None and name in _table and name not in _live:
        entry = _table[name]
        assert entry["hw"] == hw, (name, entry["hw"], hw)
        shapes = [tuple(s) for s in entry["shapes"]]
    else:
        shapes = _trace(model, hw)

    assert shapes[0] == (1, hw, hw, 3), \
        (name, shapes[0], f"live_seed={_live_seed}")
    traced = tuple(s[-1] for s in shapes[1:])
    assert traced == tuple(model.out_encoder_channels), (
        f"{name}: declared out_encoder_channels={model.out_encoder_channels},"
        f" traced {traced}")
    if isinstance(model.out_channels, (list, tuple)):
        # HRNet multi-branch contract: forward returns the branch list and
        # out_channels is the per-branch channel list
        assert traced == tuple(model.out_channels), (
            f"{name}: declared out_channels={model.out_channels}, traced {traced}")
    else:
        assert traced[-1] == model.out_channels, (
            f"{name}: declared out_channels={model.out_channels}, "
            f"last pyramid stage has {traced[-1]}")
    # Pyramid entries must be spatially monotonically non-increasing.
    hs = [s[1] for s in shapes]
    assert all(a >= b for a, b in zip(hs, hs[1:])), (name, hs)
    for s in shapes:
        assert s[0] == 1 and len(s) == 4, (name, s)
