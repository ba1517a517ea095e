"""Compositional checkpoint loading (reference: torchok/constructor/load.py:93-227).

Semantics preserved: start from the model's initial variables, overlay the
base checkpoint, then overlay per-module override checkpoints in increasing
key-depth order (so deeper overrides win), then restore ``exclude_keys``
back to the initial weights. Paths are dot-joined pytree key paths.

Accepted checkpoint formats:
* Orbax checkpoint directories produced by our ModelCheckpoint (a TrainState
  pytree — ``params``/``batch_stats`` are taken from it),
* flax msgpack files of a variables dict or params tree.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


def _flatten(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            key = f"{prefix}.{k}" if prefix else str(k)
            out.update(_flatten(v, key))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return root


def load_checkpoint_file(path: str) -> Dict[str, Any]:
    """Load a checkpoint into a variables-like dict {'params': ..., ...}."""
    p = Path(path)
    if p.is_dir():
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(str(p.absolute()))
        if isinstance(restored, dict) and "params" in restored:
            out = {"params": restored["params"]}
            if restored.get("batch_stats"):
                out["batch_stats"] = restored["batch_stats"]
            if restored.get("buffers"):
                out["buffers"] = restored["buffers"]
            return out
        return {"params": restored}
    # msgpack
    from flax import serialization
    with open(p, "rb") as f:
        restored = serialization.msgpack_restore(f.read())
    if isinstance(restored, dict) and "params" in restored:
        return restored
    return {"params": restored}


def generate_required_state_dict(
        initial_flat: Dict[str, Any],
        base_flat: Optional[Dict[str, Any]],
        overridden_name2ckpt_flat: Optional[Dict[str, Dict[str, Any]]],
        exclude_keys: Optional[List[str]],
        strict: bool = True) -> Dict[str, Any]:
    result = dict(initial_flat)

    def overlay(src: Dict[str, Any], required_prefix: str = ""):
        for key, value in src.items():
            if required_prefix and not key.startswith(required_prefix):
                continue
            if key in result:
                if strict and hasattr(result[key], "shape") and hasattr(value, "shape") \
                        and tuple(result[key].shape) != tuple(value.shape):
                    raise ValueError(
                        f"Shape mismatch for {key}: model {tuple(result[key].shape)} "
                        f"vs checkpoint {tuple(value.shape)}")
                result[key] = value
            elif strict and not required_prefix:
                raise KeyError(f"Checkpoint key {key!r} not found in model")

    if base_flat:
        overlay(base_flat)

    if overridden_name2ckpt_flat:
        # apply shallower prefixes first so deeper overrides win (load.py:93-190)
        for name in sorted(overridden_name2ckpt_flat, key=lambda n: n.count(".")):
            overlay(overridden_name2ckpt_flat[name], required_prefix=name)

    for key in exclude_keys or []:
        for k in list(result):
            if k == key or k.startswith(key + "."):
                result[k] = initial_flat[k]
    return result


def load_checkpoint(variables: Dict[str, Any],
                    base_ckpt_path: Optional[str] = None,
                    overridden_name2ckpt_path: Optional[Dict[str, str]] = None,
                    exclude_keys: Optional[List[str]] = None,
                    strict: bool = True) -> Dict[str, Any]:
    if not base_ckpt_path and not overridden_name2ckpt_path:
        return variables

    out = dict(variables)
    for collection in ("params", "batch_stats", "buffers"):
        if collection not in variables or not variables[collection]:
            continue
        initial_flat = _flatten(variables[collection])
        base_flat = None
        if base_ckpt_path:
            base_vars = load_checkpoint_file(base_ckpt_path)
            base_flat = _flatten(base_vars.get(collection, {}))
            if collection == "params" and not base_flat:
                logger.warning("Base checkpoint %s has no %s", base_ckpt_path, collection)
        over_flat = None
        if overridden_name2ckpt_path:
            over_flat = {}
            if hasattr(overridden_name2ckpt_path, "to_dict"):
                overridden_name2ckpt_path = overridden_name2ckpt_path.to_dict()
            for name, path in overridden_name2ckpt_path.items():
                ckpt_vars = load_checkpoint_file(path)
                over_flat[name] = _flatten(ckpt_vars.get(collection, {}))
        merged = generate_required_state_dict(
            initial_flat, base_flat, over_flat, exclude_keys,
            strict=strict and collection == "params")
        out[collection] = _unflatten(merged)
    return out
