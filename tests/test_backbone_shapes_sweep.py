"""Full-registry backbone shape sweep via ``jax.eval_shape`` (no FLOPs).

Round-1 review: only ~26 of 319 variants were ever instantiated; a
mis-specified channel table in the rest would pass CI. This sweeps EVERY
registered backbone name, traces ``init`` + ``forward_features`` abstractly
in ONE eval_shape (tracing dominates on the 1-CPU CI box; one combined trace
is ~2x cheaper than separate init/apply traces), and asserts the declared
``out_channels`` / ``out_encoder_channels`` match the traced pyramid.
Reference pattern: tests/additional_tests/models/backbones/test_backbone.py
:10-67 (there: one forward per family on real tensors; here: abstract eval
of all variants).

Full sweep is ~12 min; set TORCHOK_SWEEP_SAMPLE=N to check a deterministic
N-variant subsample locally.
"""
import os
import random

import jax
import jax.numpy as jnp
import pytest

from torchok_tpu.constructor import BACKBONES

ALL_BACKBONES = sorted(BACKBONES.list_models())
_sample = int(os.environ.get("TORCHOK_SWEEP_SAMPLE", "0"))
if _sample:
    rng = random.Random(20260816)
    ALL_BACKBONES = sorted(rng.sample(ALL_BACKBONES,
                                      min(_sample, len(ALL_BACKBONES))))


def _input_hw(model) -> int:
    # Transformer families pin their resolution; CNN pyramids are
    # resolution-agnostic — 64 keeps stride-32 outputs non-degenerate.
    return int(getattr(model, "img_size", 64))


@pytest.mark.parametrize("name", ALL_BACKBONES)
def test_backbone_eval_shape(name):
    model = BACKBONES.get(name)()
    hw = _input_hw(model)
    x = jax.ShapeDtypeStruct((1, hw, hw, 3), jnp.float32)

    # One combined abstract trace; `train`/`method` bound statically
    # (eval_shape abstracts every positional arg, and a traced bool breaks
    # `not train` in Dropout arguments).
    def init_and_features(rng, xx):
        variables = model.init(rng, xx, False)
        return model.apply(variables, xx, False,
                           method=model.forward_features)

    feats = jax.eval_shape(init_and_features, jax.random.PRNGKey(0), x)

    assert feats[0].shape == (1, hw, hw, 3), (name, feats[0].shape)
    traced = tuple(f.shape[-1] for f in feats[1:])
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
    hs = [f.shape[1] for f in feats]
    assert all(a >= b for a, b in zip(hs, hs[1:])), (name, hs)
    for f in feats:
        assert f.shape[0] == 1 and f.ndim == 4, (name, f.shape)
