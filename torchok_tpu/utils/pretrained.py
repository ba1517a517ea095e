"""Pretrained-weight loading.

The reference pulls timm weight URLs at runtime (reference:
torchok/models/backbones/resnet.py:566-569) and fails loudly when a load is
impossible (``build_model_with_cfg`` raises). This environment has no network
egress, so ``pretrained=True`` resolves against a local cache directory
(``TORCHOK_TPU_WEIGHTS`` or ``~/.cache/torchok_tpu/weights``) holding
msgpack-serialized Flax variable trees written by
``tools/convert_weights.py``. A cache miss is a hard error by default —
silently training from random init when the user asked for pretrained
weights is the worst failure mode. Set ``TORCHOK_PRETRAINED_ALLOW_RANDOM=1``
to degrade to a warning (CI / smoke runs that only exercise plumbing).
"""
from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Any, Optional, Sequence

logger = logging.getLogger(__name__)

_WARNED: set = set()


class PretrainedWeightsMissing(FileNotFoundError):
    """pretrained=True was requested but no converted weights are cached."""


def weights_dir() -> Path:
    return Path(os.environ.get(
        "TORCHOK_TPU_WEIGHTS",
        os.path.join(os.path.expanduser("~"), ".cache", "torchok_tpu", "weights"),
    ))


def pretrained_path(name: str) -> Optional[Path]:
    p = weights_dir() / f"{name}.msgpack"
    return p if p.exists() else None


def _allow_random() -> bool:
    return os.environ.get("TORCHOK_PRETRAINED_ALLOW_RANDOM") == "1"


def _miss(name: str) -> PretrainedWeightsMissing:
    return PretrainedWeightsMissing(
        f"pretrained=True for {name!r} but no converted weights at "
        f"{weights_dir() / (name + '.msgpack')}. This rig has no network "
        f"egress; supply a torch/timm checkpoint file and convert it once:\n"
        f"    python tools/convert_weights.py --name {name} "
        f"--checkpoint <path/to/{name}.pth>\n"
        f"(or set TORCHOK_PRETRAINED_ALLOW_RANDOM=1 to proceed from random "
        f"init).")


def maybe_load_pretrained(model: Any, name: str) -> None:
    """Validate pretrained availability at backbone-build time.

    Flax modules are stateless; actual parameter substitution happens at task
    init via :func:`load_pretrained_variables`. Here we fail fast (before any
    compilation) when the weights are unavailable — matching the reference,
    where ``build_model_with_cfg`` either loads or raises.
    """
    if pretrained_path(name) is not None:
        return
    if not _allow_random():
        raise _miss(name)
    if name not in _WARNED:
        _WARNED.add(name)
        logger.warning(
            "pretrained=True for %s but no local weights found under %s; "
            "TORCHOK_PRETRAINED_ALLOW_RANDOM=1 set — continuing with random "
            "initialization.", name, weights_dir(),
        )


def load_pretrained_params(name: str, params: Any) -> Any:
    """Merge locally cached pretrained params (if any) over ``params``."""
    restored = load_pretrained_variables(name, {"params": params})
    return restored["params"]


def load_pretrained_variables(name: str, variables: Any,
                              drop_key_substrings: Sequence[str] = ()) -> Any:
    """Merge cached pretrained variables over the backbone-scoped
    ``variables`` dict (params + batch_stats). The cache file holds the full
    variable dict written by ``tools/convert_weights.py``; files that store
    only a param tree (legacy format) still restore the params collection.

    Leaves whose path contains any of ``drop_key_substrings`` keep their
    fresh init instead of the cached value (the reference's
    ``load_relative_position_bias_table=False`` surface for fine-tuning at
    a different resolution, gcvit.py:169-174)."""
    path = pretrained_path(name)
    if path is None:
        if not _allow_random():
            raise _miss(name)
        return variables
    from flax import serialization
    with open(path, "rb") as f:
        payload = f.read()
    try:
        restored = serialization.from_bytes(variables, payload)
    except (ValueError, KeyError):
        # legacy cache: a bare param tree
        restored = dict(variables)
        restored["params"] = serialization.from_bytes(variables["params"], payload)
    if drop_key_substrings:
        from flax import traverse_util
        flat = traverse_util.flatten_dict(restored)
        init_flat = traverse_util.flatten_dict(variables)
        dropped = 0
        for key in flat:
            joined = "/".join(str(k) for k in key)
            if any(s in joined for s in drop_key_substrings):
                flat[key] = init_flat[key]
                dropped += 1
        restored = traverse_util.unflatten_dict(flat)
        logger.info("kept fresh init for %d leaves matching %s", dropped,
                    list(drop_key_substrings))
    logger.info("Loaded pretrained weights for %s from %s", name, path)
    return restored
