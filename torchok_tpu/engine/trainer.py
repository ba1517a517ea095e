"""Training engine.

Replaces PyTorch Lightning's Trainer (reference: torchok/constructor/runner.py
+ Lightning internals) with a compact TPU-native loop:

* ONE jitted ``train_step(state, batch) -> (state, outputs, losses)`` under
  GSPMD — the global batch is sharded over the ``data`` axis of a
  ``jax.sharding.Mesh``; parameters/optimizer state are replicated (dp) or
  sharded (fsdp strategy). Loss means and BatchNorm batch statistics are
  computed over the full global batch by XLA-inserted collectives, which
  subsumes the reference's ``all_gather`` loss averaging
  (reference tasks/base.py:163-185) and ``sync_batchnorm``.
* Input pipeline: host threads decode/augment (host stage), batches are
  ``device_put`` with the batch-axis sharding and the dataset's on-device
  transform suffix runs jitted before each step (double-buffered).
* Schedulers run host-side and write the new lr into the
  ``inject_hyperparams`` leaves of the optimizer state — no recompilation.
* Gradient accumulation via ``optax.MultiSteps``; clipping via
  ``optax.clip_by_global_norm`` composed before the optimizer.
"""
from __future__ import annotations

import logging
import math
import time
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from torchok_tpu.constructor.config import ConfigNode
from torchok_tpu.constructor.config_structure import Phase
from torchok_tpu.engine.callbacks import Callback
from torchok_tpu.engine.state import TrainState
from torchok_tpu.parallel.mesh import build_mesh, fsdp_sharding, tp_sharding

logger = logging.getLogger(__name__)


def _parse_max_time(value) -> Optional[float]:
    """trainer.max_time → seconds (Lightning surface: 'DD:HH:MM:SS' string,
    {'days':..,'hours':..,'minutes':..,'seconds':..} dict, timedelta, or a
    bare number of seconds)."""
    if value is None:
        return None
    import datetime
    if isinstance(value, datetime.timedelta):
        return value.total_seconds()
    if isinstance(value, (int, float)):
        return float(value)
    if isinstance(value, str):
        parts = value.split(":")
        if len(parts) != 4:
            raise ValueError(
                f"trainer.max_time string must be 'DD:HH:MM:SS', got {value!r}")
        d, h, m, s = (int(p) for p in parts)
        return float(((d * 24 + h) * 60 + m) * 60 + s)
    if hasattr(value, "get"):  # dict / ConfigNode
        get = value.get
        return float(datetime.timedelta(
            days=get("days") or 0, hours=get("hours") or 0,
            minutes=get("minutes") or 0,
            seconds=get("seconds") or 0).total_seconds())
    raise ValueError(f"Unsupported trainer.max_time value: {value!r}")


def _tree_ones_like(tree):
    return jax.tree_util.tree_map(lambda x: jnp.ones((), jnp.float32), tree)


class Trainer:
    def __init__(self, trainer_params: ConfigNode, logger_backend=None,
                 callbacks: Optional[List[Callback]] = None,
                 mesh: Optional[Mesh] = None, seed: int = 0):
        tp = trainer_params
        self.params = tp
        self.logger = logger_backend
        self.callbacks = callbacks or []
        self.seed = seed

        self.max_epochs = tp.get("max_epochs") or 1
        self.min_epochs = tp.get("min_epochs") or 0
        self.max_steps = tp.get("max_steps", -1)
        self.limit_train_batches = tp.get("limit_train_batches")
        self.limit_val_batches = tp.get("limit_val_batches")
        self.limit_test_batches = tp.get("limit_test_batches")
        self.limit_predict_batches = tp.get("limit_predict_batches")
        self.check_val_every_n_epoch = tp.get("check_val_every_n_epoch") or 1
        self.val_check_interval = tp.get("val_check_interval")
        self.log_every_n_steps = tp.get("log_every_n_steps") or 50
        self.accumulate_grad_batches = tp.get("accumulate_grad_batches") or 1
        self.steps_per_execution = max(1, tp.get("steps_per_execution") or 1)
        self.gradient_clip_val = tp.get("gradient_clip_val")
        self.gradient_clip_algorithm = tp.get("gradient_clip_algorithm") or "norm"
        if self.gradient_clip_algorithm not in ("norm", "value"):
            raise ValueError(
                "trainer.gradient_clip_algorithm must be 'norm' or 'value', "
                f"got {self.gradient_clip_algorithm!r}")
        self.min_steps = tp.get("min_steps") or 0
        self.max_time_s = _parse_max_time(tp.get("max_time"))
        self.overfit_batches = tp.get("overfit_batches") or 0
        self.reload_dataloaders_every_n_epochs = \
            tp.get("reload_dataloaders_every_n_epochs") or 0
        self.fast_dev_run = tp.get("fast_dev_run", False)
        _sanity = tp.get("num_sanity_val_steps")
        # Lightning default: 2 sanity batches before training (explicit 0 disables)
        self.num_sanity_val_steps = 2 if _sanity is None else int(_sanity)
        self.profiler = tp.get("profiler")
        self.strategy = tp.get("strategy", "auto")
        self.multiple_trainloader_mode = tp.get("multiple_trainloader_mode",
                                                "max_size_cycle")
        self.enable_progress_bar = tp.get("enable_progress_bar")
        # reference trainer.detect_anomaly (torch autograd anomaly mode) maps
        # to XLA nan-checking on every jitted computation (SURVEY.md §5)
        if tp.get("detect_anomaly"):
            jax.config.update("jax_debug_nans", True)
        if self.fast_dev_run:
            n = 1 if self.fast_dev_run is True else int(self.fast_dev_run)
            self.max_epochs = 1
            self.limit_train_batches = n
            self.limit_val_batches = n

        # multi-host bring-up BEFORE device discovery: after this,
        # jax.devices() is the global list and the mesh spans all hosts
        from torchok_tpu.parallel import init_distributed
        init_distributed(int(tp.get("num_nodes") or 1))
        self.mesh = mesh or self._build_mesh(tp)
        if self.strategy == "spatial" and "model" not in self.mesh.axis_names:
            raise ValueError(
                "strategy 'spatial' shards the image height over the 'model' "
                "mesh axis; set trainer.model_parallel_size > 1")
        if self.strategy == "spatial" and jax.process_count() > 1:
            # the multi-host batch-assembly path shards P('data') only — the
            # model axis would silently replicate compute, wasting 1/sp of
            # the pod. Fail loudly instead (docs/parallelism.md).
            raise ValueError(
                "strategy 'spatial' is single-process only: multi-host batch "
                "assembly shards the 'data' axis and would leave the 'model' "
                "axis idle; use dp/fsdp/tp for multi-host runs")

        # populated during fit
        self.state: Optional[TrainState] = None
        self.task = None
        self.bundles = []
        self.current_epoch = 0
        self.global_step = 0
        self.callback_metrics: Dict[str, float] = {}
        self.should_stop = False
        self._lr_positions: List[List[int]] = [[]]
        self._lr_bases: List[List[float]] = [[]]

    # ------------------------------------------------------------------
    @property
    def mesh(self) -> Mesh:
        return self._mesh

    @mesh.setter
    def mesh(self, m: Mesh) -> None:
        # keep the derived shardings AND the global announcement (used by
        # mesh-aware ops like the fused window attention's shard_map) in sync
        # with reassignment — a stale announced mesh would trace the kernel
        # over devices that no longer match the step's data sharding
        self._mesh = m
        self.data_sharding = NamedSharding(m, P("data"))
        self.replicated = NamedSharding(m, P())
        from torchok_tpu.parallel import set_current_mesh
        set_current_mesh(m)

    # ------------------------------------------------------------------
    @staticmethod
    def _build_mesh(tp) -> Mesh:
        devices = jax.devices()
        want = tp.get("devices", "auto")
        if isinstance(want, str) and want not in ("auto", "-1"):
            try:
                want = int(want)
            except ValueError:
                want = None
        if isinstance(want, int) and want > 0:
            # Lightning surface: `devices` is the PER-NODE accelerator count;
            # jax.devices() is the global list after multi-host bring-up.
            # Take the first `want` devices OF EACH PROCESS — a plain global
            # prefix would select only process 0's chips when want < chips
            # per host, leaving other hosts with zero local mesh devices.
            by_proc: Dict[int, int] = {}
            picked = []
            for d in devices:
                taken = by_proc.get(d.process_index, 0)
                if taken < want:
                    picked.append(d)
                    by_proc[d.process_index] = taken + 1
            devices = picked
        mp = tp.get("model_parallel_size") or 1
        return build_mesh(devices, model_parallel=mp)

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    # ------------------------------------------------------------------
    def _limit(self, n_batches: int, limit) -> int:
        if limit is None:
            return n_batches
        if isinstance(limit, float) and limit <= 1.0:
            return max(1, int(n_batches * limit))
        return min(n_batches, int(limit))

    def _shard_batch(self, host_batch: Dict[str, Any], train: bool = True):
        arrays = {k: v for k, v in host_batch.items() if isinstance(v, np.ndarray)}
        bs = next(iter(arrays.values())).shape[0] if arrays else 0
        if jax.process_count() > 1:
            if not train:
                # eval loaders are NOT process-sharded (every process reads
                # the full set so full-set meters are exact); each host holds
                # an identical full batch, so the global array is replicated
                # — assembling it under data_sharding would duplicate every
                # sample world× (fatal for retrieval-meter galleries)
                return {
                    k: jax.make_array_from_process_local_data(
                        self.replicated, v)
                    for k, v in arrays.items()
                }
            # multi-host: each process holds its own per-process slice of
            # the global batch (loader process_shard); assemble the global
            # array across hosts without gathering data onto one host
            local_devices = self.mesh.local_devices
            if bs % len(local_devices) != 0:
                raise ValueError(
                    f"multi-host training needs the per-process batch "
                    f"({bs}) divisible by the {len(local_devices)} local "
                    "devices (ragged tails cannot replicate across hosts); "
                    "set drop_last: true on the TRAIN dataloader")
            return {
                k: jax.make_array_from_process_local_data(
                    self.data_sharding, v)
                for k, v in arrays.items()
            }
        if self.strategy == "spatial" and "model" in self.mesh.axis_names:
            # spatial partitioning (single-process): images shard batch over
            # 'data' AND height over 'model' (conv halo exchanges / pooled
            # reduces are GSPMD-inserted); rank<3 arrays (targets) shard the
            # batch only. Ragged or indivisible batches replicate as usual.
            from torchok_tpu.parallel.mesh import spatial_image_sharding
            dp = self.mesh.shape["data"]
            sp = self.mesh.shape["model"]
            img_sharding = spatial_image_sharding(self.mesh)
            # only tensors that actually carry the image height co-shard over
            # 'model' — anything else (e.g. detection targets (B, N, 4) whose
            # N happens to divide sp) would force avoidable reshard
            # collectives inside the step if dim 1 were sharded (ADVICE r3)
            heights = {v.shape[1] for k, v in arrays.items()
                       if k == "image" or k.startswith("image_")
                       if getattr(v, "ndim", 0) >= 3}

            def pick(v):
                if bs % dp != 0:
                    return self.replicated
                if v.ndim >= 3 and v.shape[1] in heights \
                        and v.shape[1] % sp == 0:
                    return img_sharding
                return self.data_sharding
            return {k: jax.device_put(v, pick(v)) for k, v in arrays.items()}
        sharding = self.data_sharding if bs % self.num_devices == 0 else self.replicated
        return jax.device_put(arrays, sharding)

    @staticmethod
    def _pipeline_spec(pipe, train: bool, dtype):
        """Hashable identity of a device pipeline, used to reuse the jitted
        transform closure across ``reload_dataloaders_every_n_epochs``
        rebuilds (fresh dataset objects, identical transform config) —
        otherwise every reload re-traces the device pipeline. Conservative:
        any transform with non-primitive params gets a unique id (no reuse).
        """
        def _freeze(v):
            if isinstance(v, (str, int, float, bool, type(None))):
                return v
            if isinstance(v, (tuple, list)):
                return tuple(_freeze(x) for x in v)
            if isinstance(v, dict):
                return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
            if isinstance(v, np.ndarray):
                # Normalize stores mean/std as ndarrays — freeze by value so
                # realistic pipelines (they all end in Normalize) still cache
                return ("ndarray", v.shape, str(v.dtype), v.tobytes())
            if isinstance(v, (np.integer, np.floating, np.bool_)):
                return v.item()
            from torchok_tpu.data.transforms.base import BaseTransform
            if isinstance(v, BaseTransform):
                # containers (OneOf/SomeOf/Compose) hold child transforms —
                # freeze them recursively so container pipelines still cache
                return ("transform", type(v).__module__, type(v).__qualname__,
                        tuple(sorted((k, _freeze(x)) for k, x in vars(v).items()
                                     if not k.startswith("_"))))
            raise TypeError  # not provably identical — skip caching

        parts: list = [train, str(dtype)]
        for t in pipe.transforms:
            try:
                # underscore attrs are host-path runtime state (_local
                # thread RNGs, _base_seed) — the device path (apply_batch)
                # draws randomness from the passed JAX key only
                items = tuple(sorted(
                    (k, _freeze(v)) for k, v in vars(t).items()
                    if not k.startswith("_")))
            except TypeError:
                return None
            parts.append((type(t).__module__, type(t).__qualname__, items))
        return tuple(parts)

    def _make_device_fn(self, dataset, train: bool) -> Callable:
        pipe = dataset.device_pipeline
        spec = self._pipeline_spec(pipe, train, self.task.compute_dtype)
        if spec is not None:
            spec = (self.seed,) + spec  # base_key derives from the seed
        cache = getattr(self, "_device_fn_cache", None)
        if cache is None:
            cache = self._device_fn_cache = {}
        if spec is not None and spec in cache:
            return cache[spec]
        dtype = self.task.compute_dtype
        base_key = jax.random.PRNGKey(self.seed + (17 if train else 31))

        # keys carrying images (multi-view datasets emit image_0/image_1;
        # triplet datasets emit anchor/positive/negative)
        def _image_keys(batch):
            return [k for k in batch
                    if k == "image" or k.startswith("image_")
                    or k in ("anchor", "positive", "negative")]

        @jax.jit
        def _process(batch, key):
            batch = dict(batch)
            keys = _image_keys(batch)
            if pipe:
                if keys == ["image"]:
                    batch = dict(pipe(batch, key))
                else:
                    for i, k in enumerate(sorted(keys)):
                        sub = pipe({"image": batch[k]},
                                   jax.random.fold_in(key, 1000 + i))
                        batch[k] = sub["image"]
            for k in _image_keys(batch):
                batch[k] = batch[k].astype(dtype)
            # segmentation convention: pixel labels ride the device pipeline
            # under 'mask' (geometric device ops transform it alongside the
            # image); tasks consume them as 'target'
            if "mask" in batch and "target" not in batch:
                batch["target"] = batch.pop("mask")
            return batch

        def device_fn(host_batch, step):
            batch = self._shard_batch(host_batch, train=train)
            key = jax.random.fold_in(base_key, step)
            return _process(batch, key)

        if spec is not None:
            cache[spec] = device_fn
        return device_fn

    def _install_device_fns(self, loaders: Sequence, train: bool) -> None:
        for ld in loaders:
            ld.device_fn = self._make_device_fn(ld.dataset, train)

    # ------------------------------------------------------------------
    # optimizer plumbing
    # ------------------------------------------------------------------
    def _build_tx(self, bundle) -> optax.GradientTransformation:
        tx = bundle.tx
        if self.gradient_clip_val:
            # trainer.gradient_clip_algorithm: 'norm' = Lightning's default
            # global-norm clip; 'value' = elementwise clamp to +-clip_val
            clip = (optax.clip_by_global_norm(self.gradient_clip_val)
                    if self.gradient_clip_algorithm == "norm"
                    else optax.clip(self.gradient_clip_val))
            tx = optax.chain(clip, tx)
        if self.accumulate_grad_batches > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=self.accumulate_grad_batches)
        return tx

    def _snapshot_lr_positions(self, opt_state, n_bundles: int = 1) -> None:
        """Record the flat-leaf positions of each bundle's injected
        ``learning_rate`` hyperparameter. With several optimization groups
        ``opt_state`` is a tuple and the first path key is the bundle index."""
        leaves_with_path = jax.tree_util.tree_flatten_with_path(opt_state)[0]
        n = max(n_bundles, 1)
        self._lr_positions = [[] for _ in range(n)]
        self._lr_bases = [[] for _ in range(n)]
        for i, (path, leaf) in enumerate(leaves_with_path):
            keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
            if "learning_rate" in keys:
                b = path[0].idx if n > 1 else 0
                self._lr_positions[b].append(i)
                self._lr_bases[b].append(float(np.asarray(leaf)))

    def _apply_lr_factor(self, opt_state, factor: float, bundle_idx: int = 0):
        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        for pos, base in zip(self._lr_positions[bundle_idx],
                             self._lr_bases[bundle_idx]):
            leaves[pos] = jnp.asarray(base * factor, jnp.float32)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def current_lr(self) -> float:
        if self.bundles and self.bundles[0].scheduler is not None:
            return self.bundles[0].scheduler.current_lr
        if self._lr_bases and self._lr_bases[0]:
            return self._lr_bases[0][0]
        return 0.0

    # ------------------------------------------------------------------
    # step functions
    # ------------------------------------------------------------------
    def _make_train_step(self, task, txs):
        """One jitted optimizer step. With several optimization groups
        (reference constructor.py:37-83 + Lightning automatic optimization)
        the loss is recomputed and applied once per group, sequentially, all
        inside the same jitted step — N backwards per batch, exactly like
        Lightning calling training_step once per optimizer."""
        compute_loss = task.compute_loss
        model = task.model
        dropout_key = jax.random.PRNGKey(self.seed + 7)
        # a bare GradientTransformation is itself a NamedTuple — detect it by
        # its update attribute, not by isinstance(tuple)
        if hasattr(txs, "update") and hasattr(txs, "init"):
            txs = [txs]
        txs = list(txs)
        single = len(txs) == 1

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch):
            rngs = {"dropout": jax.random.fold_in(dropout_key, state.step)}

            def loss_fn(params, batch_stats, buffers):
                variables = {"params": params}
                mutable = []
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                    mutable.append("batch_stats")
                if buffers:
                    variables["buffers"] = buffers
                    mutable.append("buffers")
                if mutable:
                    outputs, new_vars = model.apply(variables, batch, train=True,
                                                    rngs=rngs, mutable=mutable)
                else:
                    outputs = model.apply(variables, batch, train=True, rngs=rngs)
                    new_vars = {}
                total, tagged = compute_loss(outputs)
                return total, (outputs, new_vars, tagged)

            params = state.params
            bs, buffers = state.batch_stats, state.buffers
            opt_states = (state.opt_state,) if single else state.opt_state
            new_opt_states = []
            first = None
            for i, tx in enumerate(txs):
                (loss, (outputs, new_vars, tagged)), grads = \
                    jax.value_and_grad(loss_fn, has_aux=True)(params, bs, buffers)
                grads = jax.tree_util.tree_map(lambda g, m: g * m,
                                               grads, state.grad_mask)
                updates, new_opt = tx.update(grads, opt_states[i], params)
                params = optax.apply_updates(params, updates)
                new_opt_states.append(new_opt)
                new_bs = new_vars.get("batch_stats", bs)
                if bs:
                    # bn_mask freezes running-stat updates for frozen norm layers
                    new_bs = jax.tree_util.tree_map(
                        lambda old, new, m: old * (1.0 - m) + new * m,
                        bs, new_bs, state.bn_mask)
                bs = new_bs
                buffers = new_vars.get("buffers", buffers)
                if i == 0:
                    first = (outputs, loss, tagged)

            outputs, loss, tagged = first
            new_state = state.replace(
                params=params,
                batch_stats=bs,
                buffers=buffers,
                opt_state=new_opt_states[0] if single else tuple(new_opt_states),
                step=state.step + 1,
            )
            losses = {"loss": loss, **tagged}
            return new_state, outputs, losses

        return train_step

    def _make_multi_train_step(self, train_step, micro_batch: int):
        """Fuse K train steps into one jitted lax.scan over a super-batch of
        K*B samples — one host dispatch, one transfer, one device-transform
        run per K optimizer steps (steps_per_execution)."""
        world = jax.process_count()

        @partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
        def multi_step(state, super_batch, k):
            def to_steps(x):
                if world > 1:
                    # the assembled global super-batch is PROCESS-major
                    # ((world, K*B_local) rows): each fused step must take
                    # every process's i-th local micro batch, so relabel to
                    # (K, world*B_local). The transpose follows shard
                    # boundaries — no cross-host data movement.
                    x = x.reshape((world, k, micro_batch) + x.shape[1:])
                    x = jnp.swapaxes(x, 0, 1)
                    return x.reshape((k, world * micro_batch) + x.shape[3:])
                return x.reshape((k, micro_batch) + x.shape[1:])

            stacked = jax.tree_util.tree_map(to_steps, super_batch)

            def body(s, b):
                s2, outputs, losses = train_step(s, b)
                return s2, (outputs, losses)
            state, (outputs, losses) = jax.lax.scan(body, state, stacked)
            # merge (K, B, ...) -> (K*B, ...) for metric updates
            outputs = jax.tree_util.tree_map(
                lambda x: x.reshape((-1,) + x.shape[2:]) if hasattr(x, "ndim") and x.ndim >= 2 else x,
                outputs)
            losses = jax.tree_util.tree_map(jnp.mean, losses)
            return state, outputs, losses

        return multi_step

    def _make_eval_step(self, task, with_loss: bool):
        compute_loss = task.compute_loss
        model = task.model
        has_losses = task.losses is not None

        @jax.jit
        def eval_step(state: TrainState, batch):
            outputs = model.apply(state.variables, batch, train=False)
            losses = {}
            if with_loss and has_losses:
                total, tagged = compute_loss(outputs)
                losses = {"loss": total, **tagged}
            return outputs, losses

        return eval_step

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------
    def _setup_state(self, task, ckpt_path: Optional[str] = None) -> None:
        rng = jax.random.PRNGKey(self.seed)
        variables = task.init_variables(rng)

        # pretrained backbone weights from the local cache, if requested
        if getattr(task, "pretrained_name", None):
            from torchok_tpu.utils.pretrained import load_pretrained_variables
            params = dict(variables["params"])
            if "backbone" in params:
                scoped = {"params": params["backbone"]}
                stats = dict(variables.get("batch_stats", {}))
                if "backbone" in stats:
                    scoped["batch_stats"] = stats["backbone"]
                restored = load_pretrained_variables(
                    task.pretrained_name, scoped,
                    drop_key_substrings=getattr(task, "pretrained_drop_keys", ()))
                params["backbone"] = restored["params"]
                variables = {**variables, "params": params}
                if "backbone" in stats:
                    stats["backbone"] = restored["batch_stats"]
                    variables["batch_stats"] = stats

        variables = task.on_fit_start(variables)

        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        buffers = variables.get("buffers", {})

        self.bundles = task.constructor.configure_optimizers(
            params, task.no_weight_decay()) if task.hparams.get("optimization") else []
        if self.bundles:
            self.txs = [self._build_tx(b) for b in self.bundles]
            if len(self.txs) == 1:
                opt_state = self.txs[0].init(params)
            else:
                opt_state = tuple(tx.init(params) for tx in self.txs)
            self._snapshot_lr_positions(opt_state, len(self.txs))
        else:
            self.txs = [optax.identity()]
            opt_state = self.txs[0].init(params)
        self.tx = self.txs[0]  # single-bundle alias (bench/auto_lr_find/graft)

        state = TrainState(
            params=params, batch_stats=batch_stats, buffers=buffers,
            opt_state=opt_state, grad_mask=_tree_ones_like(params),
            bn_mask=_tree_ones_like(batch_stats),
            step=jnp.zeros((), jnp.int32),
        )
        if self.strategy == "spatial":
            # spatial partitioning: params/opt-state replicated; only the
            # activations are sharded (batch over 'data', height over
            # 'model' — see _shard_batch)
            state = jax.device_put(state, self.replicated)
        elif "model" in self.mesh.axis_names:
            # tensor parallelism: head class-dim sharded over 'model';
            # optionally fsdp over 'data' on the rest
            state = jax.device_put(state, tp_sharding(
                self.mesh, state, fsdp=self.strategy == "fsdp"))
        elif self.strategy == "fsdp":
            state = jax.device_put(state, self._fsdp_sharding(state))
        else:
            state = jax.device_put(state, self.replicated)
        self.state = state

        if ckpt_path:
            from torchok_tpu.callbacks.model_checkpoint import restore_train_state
            self.state, meta = restore_train_state(ckpt_path, self.state)
            self.current_epoch = int(meta.get("epoch", 0)) + 1
            self.global_step = int(meta.get("global_step", 0))

    def _fsdp_sharding(self, state):
        return fsdp_sharding(self.mesh, state)

    # ------------------------------------------------------------------
    # loops
    # ------------------------------------------------------------------
    def _announce_mesh(self) -> None:
        # the ACTIVE trainer's mesh must be the globally announced one even if
        # another Trainer was constructed (and announced) since __init__
        from torchok_tpu.parallel import set_current_mesh
        set_current_mesh(self._mesh)

    def fit(self, task, ckpt_path: Optional[str] = None) -> None:
        self.task = task
        self._announce_mesh()
        try:
            self._fit_inner(task, ckpt_path)
        except BaseException as e:  # noqa: BLE001 — finalize loggers on any failure
            for cb in self.callbacks:
                cb.on_exception(self, task, e)
            raise

    def _fit_inner(self, task, ckpt_path: Optional[str]) -> None:
        train_loaders = task.train_dataloader()
        if not train_loaders:
            raise ValueError("No TRAIN data configured")
        val_loaders = task.val_dataloader()

        if self.overfit_batches:
            # trainer.overfit_batches (Lightning parity): train on a fixed
            # first-N-batches subset (shuffle off) and validate on those SAME
            # batches — fresh loader objects over the train data carry the
            # deterministic eval device pipeline
            ob = self.overfit_batches
            n_batches = (max(1, int(len(train_loaders[0]) * ob))
                         if isinstance(ob, float) and ob <= 1.0 else int(ob))
            self.limit_train_batches = n_batches
            self.limit_val_batches = n_batches
            val_loaders = task.train_dataloader()
            for ld in (*train_loaders, *val_loaders):
                ld.shuffle = False
            for ld in val_loaders:
                # eval batches must be identical on every host (they assemble
                # replicated); drop the TRAIN-phase per-process index shard
                ld.process_shard = False

        self._setup_state(task, ckpt_path)
        self._install_device_fns(val_loaders, train=False)

        spe = self.steps_per_execution
        if spe > 1 and len(train_loaders) > 1 and \
                len({ld.batch_size for ld in train_loaders}) > 1:
            logger.warning(
                "steps_per_execution>1 with multiple TRAIN dataloaders of "
                "differing batch sizes is unsupported; falling back to "
                "one step per execution")
            spe = 1

        # loader prep is a closure so reload_dataloaders_every_n_epochs can
        # rebuild a fresh, identically-wrapped loader mid-fit
        holder: Dict[str, Any] = {}

        def _prepare(loaders):
            self._install_device_fns(loaders, train=True)
            combined = None
            if len(loaders) > 1:
                from torchok_tpu.data.loader import CombinedTrainLoader
                tl = combined = CombinedTrainLoader(
                    loaders, mode=self.multiple_trainloader_mode)
            else:
                tl = loaders[0]
            holder["micro"] = tl.batch_size
            if spe > 1:
                if combined is not None:
                    # K consecutive interleaved batches concatenate into one
                    # super-batch; the fused scan replays them in the exact
                    # round-robin order of the unfused loop
                    combined.superbatch_k = spe
                else:
                    # loader serves K*B super-batches: one host fetch + one
                    # transfer + one device-transform run per execution
                    tl.batch_size = holder["micro"] * spe
            holder["loader"], holder["combined"] = tl, combined
            return tl

        train_loader = _prepare(train_loaders)
        micro_batch = holder["micro"]

        def _reload():
            return _prepare(task.train_dataloader())

        train_step = self._make_train_step(task, self.txs)
        multi_step = None
        if spe > 1:
            multi_step = self._make_multi_train_step(train_step, micro_batch)
        try:
            self._fit_loop(task, train_loader, val_loaders, train_step,
                           multi_step, spe, micro_batch, reload_fn=_reload)
        finally:
            # restore: repeated fit() calls must not compound the scaling
            if spe > 1:
                if holder["combined"] is not None:
                    holder["combined"].superbatch_k = 1
                else:
                    holder["loader"].batch_size = holder["micro"]

    def _fit_loop(self, task, train_loader, val_loaders, train_step,
                  multi_step, spe, micro_batch, reload_fn=None) -> None:
        eval_step = self._make_eval_step(task, task.compute_loss_on_valid)

        for cb in self.callbacks:
            cb.setup(self, task)
        for cb in self.callbacks:
            cb.on_fit_start(self, task)
        if self.logger is not None:
            self.logger.log_hyperparams(task.hparams)

        def _n_train() -> int:
            if multi_step is not None:
                # limits are in optimizer steps; loader yields spe per item
                n = len(train_loader)
                if self.limit_train_batches is not None:
                    limit_steps = self._limit(n * spe, self.limit_train_batches)
                    n = min(n, max(1, (limit_steps + spe - 1) // spe))
                return n
            return self._limit(len(train_loader), self.limit_train_batches)

        n_train = _n_train()
        # trainer.max_time: hard wall-clock stop, checked between steps
        deadline = (time.monotonic() + self.max_time_s
                    if self.max_time_s else None)
        hard_stop = False  # max_steps / max_time override min_epochs|steps
        start_epoch = self.current_epoch

        # sanity validation (Lightning parity): run a few val batches before
        # training starts so metric/loss plumbing fails fast
        if self.num_sanity_val_steps and val_loaders:
            self._run_eval(task, eval_step, val_loaders, Phase.VALID,
                           limit=self.num_sanity_val_steps)
            task.metrics_manager.reset(Phase.VALID)

        for epoch in range(self.current_epoch, self.max_epochs):
            self.current_epoch = epoch
            reload_n = self.reload_dataloaders_every_n_epochs
            if (reload_fn is not None and reload_n > 0 and epoch > start_epoch
                    and (epoch - start_epoch) % reload_n == 0):
                # trainer.reload_dataloaders_every_n_epochs: re-invoke the
                # task's train_dataloader hook (fresh dataset objects)
                train_loader = reload_fn()
                n_train = _n_train()
            # trainer.val_check_interval: validation every N optimizer steps
            # (int) or N-per-epoch (fraction); the epoch's final boundary is
            # left to the regular end-of-epoch validation below
            val_interval = None
            if self.val_check_interval is not None and val_loaders:
                v = self.val_check_interval
                val_interval = (max(1, int(n_train * spe * v))
                                if isinstance(v, float) and v <= 1.0
                                else max(1, int(v)))
            epoch_logs: Dict[str, float] = {}
            for cb in self.callbacks:
                cb.on_train_epoch_start(self, task)

            # ----- train epoch -----
            if self.profiler and epoch == self.current_epoch and epoch == 0:
                trace_dir = (self.logger.log_dir if self.logger else "/tmp") + "/profile"
                try:
                    jax.profiler.start_trace(trace_dir)
                    self._profiling = True
                except Exception:  # noqa: BLE001 — profiling is best-effort
                    self._profiling = False
            t0 = time.perf_counter()
            train_loader.set_epoch(epoch)
            # device-side loss accumulation: converting to python floats every
            # step would synchronize the host with the TPU per step and
            # destroy pipelining (measured ~15x slowdown); sums stay on device
            # and are read once per epoch / log interval
            loss_sums: Dict[str, Any] = {}
            n_steps = 0
            n_execs = 0
            for bidx, batch in enumerate(train_loader):
                if bidx >= n_train:
                    break
                if multi_step is not None:
                    size = jax.tree_util.tree_leaves(batch)[0].shape[0]
                    # the device batch is GLOBAL; step counts derive from the
                    # per-process share (process-major row layout multi-host)
                    world = jax.process_count()
                    local = size // world
                    k = local // micro_batch
                    rem = local % micro_batch

                    def _rows(x, lo, hi):
                        xw = x.reshape((world, local) + x.shape[1:])[:, lo:hi]
                        return xw.reshape((world * (hi - lo),) + x.shape[1:])

                    if k >= 1 and rem == 0:
                        self.state, outputs, losses = multi_step(self.state, batch, k)
                        executed = k
                    elif k >= 1:
                        # ragged tail spanning >1 micro batch: run the full
                        # micro batches fused, then the remainder as one step
                        # (matches the non-fused run's step count/trajectory)
                        full = jax.tree_util.tree_map(
                            lambda x: _rows(x, 0, k * micro_batch), batch)
                        tail = jax.tree_util.tree_map(
                            lambda x: _rows(x, k * micro_batch, local), batch)
                        self.state, full_outputs, losses = multi_step(self.state, full, k)
                        # the fused part's outputs feed metrics here; the tail's
                        # flow through the shared update below
                        task.metrics_manager.update(Phase.TRAIN, 0, **full_outputs)
                        self.state, outputs, tail_losses = train_step(self.state, tail)
                        losses = {kk: (losses[kk] * k + tail_losses[kk]) / (k + 1)
                                  for kk in losses}
                        executed = k + 1
                    else:  # ragged tail smaller than one micro batch
                        self.state, outputs, losses = train_step(self.state, batch)
                        executed = 1
                else:
                    self.state, outputs, losses = train_step(self.state, batch)
                    executed = 1
                task.metrics_manager.update(Phase.TRAIN, 0, **outputs)
                prev_step = self.global_step
                n_steps += executed
                n_execs += 1
                self.global_step += executed
                for k, v in losses.items():
                    loss_sums[k] = v if k not in loss_sums else loss_sums[k] + v
                # step-interval schedulers advance once per optimizer step; in
                # multi-step mode the lr update lands between executions (lr is
                # constant within one fused scan, matching an accumulated step)
                for b_idx, bundle in enumerate(self.bundles):
                    if bundle.scheduler is None or bundle.scheduler_interval != "step":
                        continue
                    fired = (self.global_step // bundle.scheduler_frequency
                             - prev_step // bundle.scheduler_frequency)
                    if fired <= 0:
                        continue
                    for _ in range(fired):
                        new_lr = bundle.scheduler.step()
                    factor = new_lr / bundle.scheduler.base_lr \
                        if bundle.scheduler.base_lr else 1.0
                    self.state = self.state.replace(
                        opt_state=self._apply_lr_factor(self.state.opt_state,
                                                        factor, b_idx))
                if (self.global_step // self.log_every_n_steps
                        > prev_step // self.log_every_n_steps):
                    host_losses = {k: float(v) for k, v in losses.items()}
                    if self.logger is not None:
                        self.logger.log_metrics(
                            {f"train/{k}": v for k, v in host_losses.items()},
                            step=self.global_step)
                    for cb in self.callbacks:
                        cb.on_train_batch_end(self, task, self.global_step, host_losses)
                if (val_interval is not None and bidx < n_train - 1
                        # anchored to the EPOCH-relative step position so the
                        # cadence does not drift when steps-per-epoch is not
                        # a multiple of the interval (Lightning semantics)
                        and n_steps // val_interval
                        > (n_steps - executed) // val_interval):
                    val_logs = self._run_eval(task, eval_step, val_loaders,
                                              Phase.VALID)
                    self.callback_metrics.update(val_logs)
                    if self.logger is not None:
                        self.logger.log_metrics(val_logs, step=self.global_step)
                    for cb in self.callbacks:
                        cb.on_validation_epoch_end(self, task, val_logs)
                if 0 < self.max_steps <= self.global_step:
                    self.should_stop = hard_stop = True
                    break
                if deadline is not None and time.monotonic() >= deadline:
                    logger.info("trainer.max_time reached — stopping")
                    self.should_stop = hard_stop = True
                    break
            loss_sums = {k: float(v) for k, v in loss_sums.items()}
            epoch_time = time.perf_counter() - t0
            if getattr(self, "_profiling", False):
                jax.profiler.stop_trace()
                self._profiling = False
                logger.info("jax profiler trace written under the logger dir")

            # in multi-step mode each execution contributes one (mean) loss value
            train_logs = {f"train/{k}": v / max(n_execs, 1) for k, v in loss_sums.items()}
            train_logs.update(task.metrics_manager.on_epoch_end(Phase.TRAIN))
            train_logs["train/epoch_time_s"] = epoch_time
            if n_steps:
                train_logs["train/images_per_sec"] = (
                    n_steps * micro_batch * jax.process_count() / epoch_time)
            epoch_logs.update(train_logs)
            for cb in self.callbacks:
                cb.on_train_epoch_end(self, task, train_logs)

            # ----- validation -----
            if val_loaders and (epoch + 1) % self.check_val_every_n_epoch == 0:
                val_logs = self._run_eval(task, eval_step, val_loaders, Phase.VALID)
                epoch_logs.update(val_logs)
                for cb in self.callbacks:
                    cb.on_validation_epoch_end(self, task, val_logs)

            # ----- schedulers -----
            for b_idx, bundle in enumerate(self.bundles):
                sched = bundle.scheduler
                if sched is None or bundle.scheduler_interval != "epoch":
                    continue
                if (epoch + 1) % bundle.scheduler_frequency == 0:
                    metric = epoch_logs.get(bundle.scheduler_monitor)
                    new_lr = sched.step(metric)
                    factor = new_lr / sched.base_lr if sched.base_lr else 1.0
                    self.state = self.state.replace(
                        opt_state=self._apply_lr_factor(self.state.opt_state,
                                                        factor, b_idx))
            epoch_logs["lr"] = self.current_lr()

            self.callback_metrics = dict(epoch_logs)
            if self.logger is not None:
                self.logger.log_metrics(epoch_logs, step=self.global_step)
            for cb in self.callbacks:
                cb.on_epoch_end(self, task, epoch_logs)

            if hard_stop:  # max_steps / max_time win over min_epochs|steps
                break
            if self.should_stop or any(cb.should_stop(self) for cb in self.callbacks):
                # early stops wait out both floors (Lightning min_epochs AND
                # min_steps semantics)
                if epoch + 1 >= self.min_epochs and \
                        self.global_step >= self.min_steps:
                    break

        for cb in self.callbacks:
            cb.on_fit_end(self, task)
        if self.logger is not None:
            self.logger.finalize("success")

    def _run_eval(self, task, eval_step, loaders, phase: Phase,
                  limit=None) -> Dict[str, float]:
        limit = limit if limit is not None else (
            self.limit_val_batches if phase == Phase.VALID else self.limit_test_batches)
        loss_sums: Dict[str, float] = {}
        n_steps = 0
        for dl_idx, loader in enumerate(loaders):
            n_batches = self._limit(len(loader), limit)
            for bidx, batch in enumerate(loader):
                if bidx >= n_batches:
                    break
                outputs, losses = eval_step(self.state, batch)
                task.metrics_manager.update(phase, dl_idx, **outputs)
                for k, v in losses.items():
                    loss_sums[k] = loss_sums.get(k, 0.0) + float(v)
                n_steps += 1
        logs = {f"{phase.value}/{k}": v / max(n_steps, 1) for k, v in loss_sums.items()}
        logs.update(task.metrics_manager.on_epoch_end(phase))
        return logs

    # ------------------------------------------------------------------
    def test(self, task, ckpt_path: Optional[str] = None) -> Dict[str, float]:
        self.task = task
        self._announce_mesh()
        loaders = task.test_dataloader()
        if self.state is None:
            self._setup_state(task, ckpt_path)
        self._install_device_fns(loaders, train=False)
        eval_step = self._make_eval_step(task, with_loss=False)
        logs = self._run_eval(task, eval_step, loaders, Phase.TEST,
                              limit=self.limit_test_batches)
        self.callback_metrics = dict(logs)
        if self.logger is not None:
            self.logger.log_metrics(logs, step=self.global_step)
            self.logger.finalize("success")
        for cb in self.callbacks:
            cb.on_test_end(self, task, logs)
        return logs

    def predict(self, task, ckpt_path: Optional[str] = None) -> List[Dict[str, np.ndarray]]:
        self.task = task
        self._announce_mesh()
        loaders = task.predict_dataloader()
        if self.state is None:
            self._setup_state(task, ckpt_path)
        self._install_device_fns(loaders, train=False)
        eval_step = self._make_eval_step(task, with_loss=False)
        results = []
        for loader in loaders:
            n_batches = self._limit(len(loader), self.limit_predict_batches)
            for bidx, batch in enumerate(loader):
                if bidx >= n_batches:
                    break
                outputs, _ = eval_step(self.state, batch)
                results.append({k: np.asarray(v) for k, v in outputs.items()})
        return results
