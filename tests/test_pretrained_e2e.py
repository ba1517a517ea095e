"""End-to-end pretrained-weight contract.

Reference behavior: ``build_model_with_cfg`` either loads the timm weights or
fails loudly (reference: torchok/models/backbones/resnet.py:566-569). Offline,
the one-command path is:

    python tools/convert_weights.py --name resnet18 --checkpoint r18.pth

then ``pretrained=True`` picks the converted msgpack up from the cache. This
file drives that path: torch .pth file -> convert_checkpoint -> cache ->
``BACKBONES.get(name)(pretrained=True)`` -> trainer state carries the
converted weights and the forward matches the torch oracle; and pins the
hard-fail on a cache miss.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import torchok_tpu  # noqa: F401
from torchok_tpu.constructor import BACKBONES
from torchok_tpu.utils.pretrained import PretrainedWeightsMissing
from torchok_tpu.utils.torch_convert import convert_checkpoint

from tests.test_torch_convert import (_make_resnet18_state_dict,
                                      _torch_resnet18_features)
from tests.test_train_loop import build, make_config


@pytest.fixture
def strict_pretrained(tmp_path, monkeypatch):
    """Empty weight cache + the hard-fail default (conftest sets the
    test-suite escape hatch; these tests pin the production contract)."""
    monkeypatch.setenv("TORCHOK_TPU_WEIGHTS", str(tmp_path))
    monkeypatch.delenv("TORCHOK_PRETRAINED_ALLOW_RANDOM", raising=False)
    return tmp_path


def test_pretrained_miss_hard_fails_with_convert_command(strict_pretrained):
    with pytest.raises(PretrainedWeightsMissing) as ei:
        BACKBONES.get("resnet18")(pretrained=True)
    msg = str(ei.value)
    assert "tools/convert_weights.py --name resnet18" in msg
    assert "TORCHOK_PRETRAINED_ALLOW_RANDOM" in msg


def test_pretrained_miss_allows_random_with_env(strict_pretrained, monkeypatch):
    monkeypatch.setenv("TORCHOK_PRETRAINED_ALLOW_RANDOM", "1")
    model = BACKBONES.get("resnet18")(pretrained=True)  # warns, not raises
    assert model is not None


def test_torch_file_to_cache_to_pretrained_forward(strict_pretrained, tmp_path):
    gen = np.random.default_rng(11)
    sd = _make_resnet18_state_dict(gen)
    pth = tmp_path / "resnet18.pth"
    torch.save(sd, pth)

    out, report = convert_checkpoint("resnet18", str(pth), image_size=64)
    assert not report.missing and not report.unused
    assert out == str(tmp_path / "resnet18.msgpack")

    # build-time validation passes now that the cache is populated
    model = BACKBONES.get("resnet18")(pretrained=True)

    # the trainer path: a task with pretrained: true gets the converted
    # weights merged into its state at _setup_state
    config = make_config(tmp_path, max_epochs=1)
    config.task.params.backbone_params["pretrained"] = True
    task, trainer = build(config)
    trainer._setup_state(task)
    loaded_k = np.asarray(trainer.state.params["backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(
        loaded_k, sd["conv1.weight"].numpy().transpose(2, 3, 1, 0))

    # and the loaded backbone reproduces the torch forward
    x_np = gen.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    xin = jnp.asarray(x_np.transpose(0, 2, 3, 1))
    variables = {"params": trainer.state.params["backbone"],
                 "batch_stats": trainer.state.batch_stats["backbone"]}
    ours = np.asarray(model.apply(variables, xin, False))
    with torch.no_grad():
        theirs = _torch_resnet18_features(sd, torch.from_numpy(x_np)).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), theirs,
                               rtol=1e-3, atol=1e-3)
