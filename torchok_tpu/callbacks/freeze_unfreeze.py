"""FreezeUnfreeze callback (reference: torchok/callbacks/freeze_unfreeze.py:52-184).

Declarative freeze policies by module path, backbone stage, or module class.
Functional realization: instead of mutating ``requires_grad`` the callback
recomputes two 0/1 mask pytrees at each epoch start —

* ``grad_mask`` over params (multiplied into gradients in the train step),
* ``bn_mask`` over batch_stats (gates running-stat updates, the
  ``bn_track_running_stats`` equivalent)

and swaps them into the TrainState. Changing masks retraces the step once
per distinct mask value, which happens at most a few times per run.

Policy fields (YAML parity with the reference):
  - module_name: parameter-path prefix ('' = whole model)
  - epoch: unfreeze at this epoch (absent = frozen forever)
  - stages: freeze the first N backbone stages (uses backbone.get_stages)
  - module_class: restrict to a layer class, e.g. '_BatchNorm'/'BatchNorm2d'
  - bn_requires_grad / bn_track_running_stats: BN-specific switches
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from torchok_tpu.constructor import CALLBACKS
from torchok_tpu.engine.callbacks import Callback

logger = logging.getLogger(__name__)

_NORM_CLASS_TOKENS = {
    "_BatchNorm": ("bn", "batchnorm", "norm"),
    "BatchNorm2d": ("bn", "batchnorm"),
    "BatchNorm": ("bn", "batchnorm"),
    "LayerNorm": ("layernorm", "ln", "norm"),
    "Dropout": (),  # dropout has no params; freezing it is a no-op here
}


def _path_str(path: Tuple) -> str:
    return ".".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def _matches_class(path: str, module_class: Optional[str]) -> bool:
    if module_class is None:
        return True
    tokens = _NORM_CLASS_TOKENS.get(module_class)
    if tokens is None:
        tokens = (module_class.lower(),)
    parts = path.lower().split(".")
    return any(any(part.startswith(tok) or tok in part for tok in tokens)
               for part in parts)


@CALLBACKS.register_class
class FreezeUnfreeze(Callback):
    def __init__(self, freeze_modules: List[Dict], **_):
        self.freeze_modules = [dict(m.to_dict() if hasattr(m, "to_dict") else m)
                               for m in freeze_modules]
        self._applied_key = None

    def _frozen_prefixes(self, task, policy: Dict) -> List[str]:
        module_name = policy.get("module_name", "") or ""
        if policy.get("stage") is not None and "stages" not in policy:
            policy = {**policy, "stages": policy["stage"]}  # both spellings appear in reference recipes
        if "stages" in policy and policy["stages"] is not None:
            backbone = getattr(task, "_backbone", None)
            if backbone is None:
                logger.warning("FreezeUnfreeze: stages policy but task has no backbone")
                return []
            stage_prefixes = backbone.get_stages(policy["stages"])
            base = f"{module_name}." if module_name else ""
            return [f"{base}{p}" for p in stage_prefixes]
        return [module_name]

    def _policy_active(self, policy: Dict, epoch: int) -> bool:
        unfreeze_epoch = policy.get("epoch")
        if unfreeze_epoch is None:
            return True  # frozen forever
        return epoch < unfreeze_epoch

    def _compute_masks(self, trainer, task):
        epoch = trainer.current_epoch
        active = [p for p in self.freeze_modules if self._policy_active(p, epoch)]

        def param_mask(path, leaf):
            p = _path_str(path)
            for policy in active:
                module_class = policy.get("module_class")
                if module_class in _NORM_CLASS_TOKENS and _NORM_CLASS_TOKENS[module_class] == ():
                    continue
                for prefix in self._frozen_prefixes(task, policy):
                    if not p.startswith(prefix):
                        continue
                    if module_class is not None:
                        if not _matches_class(p, module_class):
                            continue
                        # BN-specific: bn_requires_grad False -> freeze
                        if policy.get("bn_requires_grad", False):
                            continue
                    return jnp.zeros((), jnp.float32)
            return jnp.ones((), jnp.float32)

        def bn_mask(path, leaf):
            p = _path_str(path)
            for policy in active:
                module_class = policy.get("module_class")
                for prefix in self._frozen_prefixes(task, policy):
                    if not p.startswith(prefix):
                        continue
                    if module_class is not None and not _matches_class(p, module_class):
                        continue
                    # stats update allowed only when explicitly requested
                    if module_class is not None and policy.get("bn_track_running_stats", True):
                        continue
                    return jnp.zeros((), jnp.float32)
            return jnp.ones((), jnp.float32)

        gm = jax.tree_util.tree_map_with_path(param_mask, trainer.state.params)
        bm = jax.tree_util.tree_map_with_path(bn_mask, trainer.state.batch_stats)
        return gm, bm

    def on_train_epoch_start(self, trainer, task) -> None:
        gm, bm = self._compute_masks(trainer, task)
        key = (tuple(jax.tree_util.tree_leaves(jax.tree_util.tree_map(float, gm))),
               tuple(jax.tree_util.tree_leaves(jax.tree_util.tree_map(float, bm))))
        if key != self._applied_key:
            self._applied_key = key
            n_frozen = sum(1 for v in jax.tree_util.tree_leaves(gm) if float(v) == 0.0)
            logger.info("FreezeUnfreeze: %d parameter leaves frozen at epoch %d",
                        n_frozen, trainer.current_epoch)
            trainer.state = trainer.state.replace(grad_mask=gm, bn_mask=bm)


@CALLBACKS.register_class
class BackboneFinetuning(Callback):
    """Freeze the backbone for N epochs, then unfreeze
    (Lightning-name parity; realized through grad masks like FreezeUnfreeze)."""

    def __init__(self, unfreeze_backbone_at_epoch: int = 10, **_):
        self._inner = FreezeUnfreeze(freeze_modules=[
            {"module_name": "backbone", "epoch": unfreeze_backbone_at_epoch}
        ])

    def on_train_epoch_start(self, trainer, task) -> None:
        self._inner.on_train_epoch_start(trainer, task)
