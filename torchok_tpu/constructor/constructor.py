"""Constructor: factories for optimizers, schedulers, dataloaders, losses and
metrics (reference: torchok/constructor/constructor.py:21-395).

JAX adaptation: optimizers are optax transformations built over the task's
parameter pytree. The reference's mmcv-style ``paramwise_cfg`` (custom_keys
longest-substring match, bias_lr_mult, norm_decay_mult, dwconv_decay_mult)
is realized as an ``optax.multi_transform`` whose labels are computed from
flattened parameter paths; each label group gets its own
``inject_hyperparams``-wrapped chain so the host-side scheduler can retune
the learning rate between steps without recompilation.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import numpy as np
import optax

from torchok_tpu.constructor import (
    DATASETS, LOSSES, OPTIMIZERS, SAMPLERS, SCHEDULERS, TRANSFORMS,
)
from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.constructor.config_structure import Phase
from torchok_tpu.data.loader import DataLoader
from torchok_tpu.data.transforms import Compose
from torchok_tpu.losses.base import JointLoss
from torchok_tpu.metrics.metrics_manager import MetricsManager


@dataclasses.dataclass
class OptimizerBundle:
    """One optimization group: the optax transformation plus scheduler info."""
    tx: optax.GradientTransformation
    # label -> base lr for that param group (used when rescaling from scheduler)
    group_base_lrs: Dict[str, float]
    scheduler: Optional[Any] = None
    scheduler_interval: str = "epoch"
    scheduler_frequency: int = 1
    scheduler_monitor: str = "val_loss"


def _path_str(path: Tuple) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def _is_norm_param(path: str) -> bool:
    lowered = path.lower()
    return any(tok in lowered for tok in ("bn", "norm", "batchnorm", "layernorm", "groupnorm"))


def _is_dwconv_kernel(path: str, leaf) -> bool:
    return path.endswith("kernel") and getattr(leaf, "ndim", 0) == 4 and leaf.shape[2] == 1


class Constructor:
    def __init__(self, hparams: ConfigNode):
        self._hparams = hparams

    @property
    def hparams(self) -> ConfigNode:
        return self._hparams

    # ------------------------------------------------------------------
    # Optimizers
    # ------------------------------------------------------------------
    def configure_optimizers(self, params, no_weight_decay_paths: Sequence[str] = (),
                             optim_idx: int = -1) -> List[OptimizerBundle]:
        optims_params = self._hparams.optimization or []
        if 0 <= optim_idx < len(optims_params):
            optims_params = [optims_params[optim_idx]]
        elif optim_idx >= len(optims_params):
            raise ValueError(
                f"You requested optimization with index {optim_idx} while there're only "
                f"{len(optims_params)} optimization parameters are specified"
            )
        bundles = []
        for op in optims_params:
            tx, group_lrs = self.create_optimizer(params, op.optimizer, no_weight_decay_paths)
            bundle = OptimizerBundle(tx=tx, group_base_lrs=group_lrs)
            sched = op.get("scheduler") if hasattr(op, "get") else op.scheduler
            if sched:
                scheduler = SCHEDULERS.get(sched.name)(**_as_dict(sched.params))
                base_lr = max(group_lrs.values()) if group_lrs else 0.0
                scheduler.attach(base_lr)
                bundle.scheduler = scheduler
                pl = sched.get("pl_params") or {}
                bundle.scheduler_interval = pl.get("interval", "epoch") or "epoch"
                bundle.scheduler_frequency = pl.get("frequency", 1) or 1
                bundle.scheduler_monitor = pl.get("monitor", "val_loss") or "val_loss"
            bundles.append(bundle)
        return bundles

    @staticmethod
    def create_optimizer(params, optimizer_params,
                         no_weight_decay_paths: Sequence[str] = ()
                         ) -> Tuple[optax.GradientTransformation, Dict[str, float]]:
        opt_factory = OPTIMIZERS.get(optimizer_params.name)
        opt_cfg = _as_dict(optimizer_params.get("params") or {})
        paramwise_cfg = _as_dict(optimizer_params.get("paramwise_cfg") or {})

        base_lr = opt_cfg.pop("lr", opt_cfg.pop("learning_rate", 1e-3))
        base_wd = opt_cfg.get("weight_decay", None)

        custom_keys = paramwise_cfg.get("custom_keys", {})
        sorted_keys = sorted(sorted(custom_keys.keys()), key=len, reverse=True)
        bias_lr_mult = paramwise_cfg.get("bias_lr_mult", 1.0)
        bias_decay_mult = paramwise_cfg.get("bias_decay_mult", 1.0)
        norm_decay_mult = paramwise_cfg.get("norm_decay_mult", 1.0)
        dwconv_decay_mult = paramwise_cfg.get("dwconv_decay_mult", 1.0)

        def leaf_label(path: Tuple, leaf) -> str:
            p = _path_str(path)
            lr_mult, decay_mult = 1.0, 1.0
            matched = False
            for key in sorted_keys:
                if key in p:
                    matched = True
                    lr_mult = custom_keys[key].get("lr_mult", 1.0)
                    if base_wd is not None:
                        decay_mult = custom_keys[key].get("decay_mult", 1.0)
                    break
            if not matched:
                is_bias = p.endswith("bias")
                is_norm = _is_norm_param(p)
                if is_bias and not is_norm:
                    lr_mult = bias_lr_mult
                if base_wd is not None:
                    if is_norm:
                        decay_mult = norm_decay_mult
                    elif _is_dwconv_kernel(p, leaf):
                        decay_mult = dwconv_decay_mult
                    elif is_bias:
                        decay_mult = bias_decay_mult
                # best-practice no-decay group: biases, 1D tensors, scalars,
                # and module-declared no_weight_decay paths
                if getattr(leaf, "ndim", 0) <= 1 or any(k in p for k in no_weight_decay_paths):
                    decay_mult = 0.0
            return f"lr{lr_mult}_wd{decay_mult}"

        labels = jax.tree_util.tree_map_with_path(leaf_label, params)
        label_set = sorted(set(jax.tree_util.tree_leaves(labels)))

        group_lrs: Dict[str, float] = {}
        transforms: Dict[str, optax.GradientTransformation] = {}
        for label in label_set:
            lr_mult = float(label.split("_")[0][2:])
            decay_mult = float(label.split("_")[1][2:])
            cfg = dict(opt_cfg)
            if base_wd is not None:
                cfg["weight_decay"] = base_wd * decay_mult
            group_lr = base_lr * lr_mult

            def make(learning_rate, _cfg=cfg):
                return opt_factory(learning_rate=learning_rate, **_cfg)

            transforms[label] = optax.inject_hyperparams(make)(learning_rate=group_lr)
            group_lrs[label] = group_lr

        if len(label_set) == 1:
            return transforms[label_set[0]], group_lrs
        return optax.multi_transform(transforms, labels), group_lrs

    # ------------------------------------------------------------------
    # Data
    # ------------------------------------------------------------------
    def create_dataloaders(self, phase: Phase) -> List[DataLoader]:
        data = self._hparams.get("data") or {}
        phase_cfgs = data.get(phase.name) if hasattr(data, "get") else None
        if not phase_cfgs:
            return []
        # multi-host: TRAIN loaders shard indices per process (Lightning's
        # DistributedSampler insertion, gated by the same
        # trainer.use_distributed_sampler flag — config_structure.py:181);
        # eval loaders stay unsharded so every process computes the
        # full-set metric values exactly
        trainer_cfg = self._hparams.get("trainer")
        use_dist = True
        if trainer_cfg is not None:
            use_dist = trainer_cfg.get("use_distributed_sampler")
            use_dist = True if use_dist is None else bool(use_dist)
        shard = phase.name == "TRAIN" and use_dist
        return [
            self._prepare_dataloader(pc.dataset, pc.dataloader,
                                     pc.get("sampler"), process_shard=shard)
            for pc in phase_cfgs if pc is not None
        ]

    @staticmethod
    def _prepare_dataloader(dataset_params, dataloader_params, sampler_params,
                            process_shard: bool = False) -> DataLoader:
        dataset = Constructor._create_dataset(dataset_params)
        sampler = None
        if sampler_params:
            sp = _as_dict(sampler_params.get("params") or {})
            sampler = SAMPLERS.get(sampler_params.name)(**sp)
        return DataLoader(dataset=dataset, sampler=sampler,
                          process_shard=process_shard,
                          **_as_dict(dataloader_params))

    @staticmethod
    def _create_dataset(dataset_params):
        transform = Constructor._create_transforms(dataset_params.get("transform"))
        augment = Constructor._create_transforms(dataset_params.get("augment"))
        dataset_class = DATASETS.get(dataset_params.name)
        return dataset_class(transform=transform, augment=augment,
                             **_as_dict(dataset_params.get("params") or {}))

    @staticmethod
    def _prepare_transforms_recursively(transforms) -> List:
        out = []
        for info in transforms or []:
            name = info["name"] if not hasattr(info, "name") else info.name
            params = _as_dict(info.get("params") or {}) if hasattr(info, "get") else \
                _as_dict(info.get("params", {}))
            if "transforms" in params:
                out.append(Constructor._prepare_base_compose(name, **params))
            else:
                out.append(TRANSFORMS.get(name)(**params))
        return out

    @staticmethod
    def _prepare_base_compose(compose_name: str, **kwargs):
        transforms = kwargs.pop("transforms", None)
        if transforms is None:
            raise ValueError(f"There are transforms must be specified for {compose_name} composition")
        tlist = Constructor._prepare_transforms_recursively(transforms)
        return TRANSFORMS.get(compose_name)(transforms=tlist, **kwargs)

    @staticmethod
    def _create_transforms(transforms_params) -> Optional[Compose]:
        if not transforms_params:
            return None
        return Constructor._prepare_base_compose("Compose", transforms=transforms_params)

    # ------------------------------------------------------------------
    # Losses / metrics
    # ------------------------------------------------------------------
    def configure_losses(self) -> Optional[JointLoss]:
        jl = self._hparams.get("joint_loss")
        if not jl:
            return None
        loss_fns, mappings, tags, weights = [], [], [], []
        for lc in jl.losses:
            loss_fns.append(LOSSES.get(lc.name)(**_as_dict(lc.get("params") or {})))
            mappings.append(_as_dict(lc.mapping))
            tags.append(lc.get("tag"))
            weights.append(lc.get("weight"))
        normalize = jl.get("normalize_weights", True)
        return JointLoss(loss_fns, mappings, tags, weights, normalize)

    def configure_metrics_manager(self) -> MetricsManager:
        return MetricsManager(self._hparams.get("metrics") or [])


def _as_dict(obj: Any) -> Dict[str, Any]:
    if obj is None:
        return {}
    if isinstance(obj, ConfigNode):
        return obj.to_dict()
    if isinstance(obj, dict):
        return {k: (v.to_dict() if isinstance(v, ConfigNode) else v) for k, v in obj.items()}
    return dict(obj)
