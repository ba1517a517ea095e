"""Common callbacks (reference: torchok/callbacks/__init__.py:11-23 —
Lightning re-registrations rebuilt natively)."""
from __future__ import annotations

import logging
import time
from typing import Dict, Optional

import jax
import numpy as np

from torchok_tpu.constructor import CALLBACKS
from torchok_tpu.engine.callbacks import Callback

logger = logging.getLogger(__name__)


@CALLBACKS.register_class
class EarlyStopping(Callback):
    def __init__(self, monitor: str, min_delta: float = 0.0, patience: int = 3,
                 mode: str = "min", **_):
        self.monitor = monitor
        self.min_delta = min_delta
        self.patience = patience
        self.mode = mode
        self.best: Optional[float] = None
        self.wait = 0
        self._stop = False

    def on_epoch_end(self, trainer, task, logs: Dict[str, float]) -> None:
        if self.monitor not in logs:
            return
        value = float(logs[self.monitor])
        improved = (self.best is None or
                    (value < self.best - self.min_delta if self.mode == "min"
                     else value > self.best + self.min_delta))
        if improved:
            self.best = value
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                self._stop = True
                logger.info("EarlyStopping: %s did not improve for %d epochs",
                            self.monitor, self.patience)

    def should_stop(self, trainer) -> bool:
        return self._stop


@CALLBACKS.register_class
class FinalizeLogger(Callback):
    """Flush logger with KILLED/FAILED status on any exception
    (reference: torchok/callbacks/finalize_logger.py:7-14)."""

    def on_exception(self, trainer, task, exception: BaseException) -> None:
        if trainer.logger is not None:
            status = "KILLED" if isinstance(exception, KeyboardInterrupt) else "FAILED"
            trainer.logger.finalize(status)


@CALLBACKS.register_class
class LearningRateMonitor(Callback):
    def __init__(self, logging_interval: str = "epoch", **_):
        self.logging_interval = logging_interval

    def on_epoch_end(self, trainer, task, logs: Dict[str, float]) -> None:
        if trainer.logger is not None:
            trainer.logger.log_metrics({"lr": trainer.current_lr()},
                                       step=trainer.global_step)


@CALLBACKS.register_class
class TQDMProgressBar(Callback):
    """Console progress reporting (tqdm-free, per-epoch summary lines)."""

    def __init__(self, refresh_rate: int = 1, **_):
        self.refresh_rate = refresh_rate
        self._t0 = None

    def on_train_epoch_start(self, trainer, task) -> None:
        self._t0 = time.perf_counter()

    def on_epoch_end(self, trainer, task, logs: Dict[str, float]) -> None:
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        parts = [f"epoch {trainer.current_epoch}", f"{dt:.1f}s"]
        for k, v in sorted(logs.items()):
            if isinstance(v, (int, float)) and not k.endswith("epoch_time_s"):
                parts.append(f"{k}={v:.4f}")
        print(" | ".join(parts), flush=True)


@CALLBACKS.register_class
class RichProgressBar(TQDMProgressBar):
    pass


@CALLBACKS.register_class
class ModelSummary(Callback):
    """Per-module parameter/state table at fit start (Lightning parity:
    reference re-registers pl.callbacks.ModelSummary). ``max_depth`` bounds
    how deep into the param tree the breakdown goes."""

    def __init__(self, max_depth: int = 1, **_):
        self.max_depth = max_depth

    @staticmethod
    def _count(tree) -> int:
        return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)))

    def _rows(self, tree, prefix, depth):
        if depth >= self.max_depth or not isinstance(tree, dict):
            return []
        rows = []
        for name, sub in tree.items():
            path = f"{prefix}{name}"
            rows.append((path, self._count(sub)))
            rows.extend(self._rows(sub, path + ".", depth + 1))
        return rows

    def on_fit_start(self, trainer, task) -> None:
        params = trainer.state.params
        total = self._count(params)
        trainable = self._count(jax.tree_util.tree_map(
            lambda p, m: p if float(np.max(m)) > 0 else np.zeros((0,)),
            params, jax.device_get(trainer.state.grad_mask)))
        stats = self._count(trainer.state.batch_stats) + \
            self._count(trainer.state.buffers)
        rows = self._rows(params, "", 0)
        width = max([len(r[0]) for r in rows], default=4)
        lines = [f"  {name:<{width}}  {cnt / 1e6:>8.2f}M" for name, cnt in rows]
        print("\n".join([
            *lines,
            f"Trainable params: {trainable / 1e6:.2f}M",
            f"Non-trainable params: {(total - trainable) / 1e6:.2f}M",
            f"Norm stats / buffers: {stats / 1e6:.2f}M",
            f"Total params: {total / 1e6:.2f}M",
        ]), flush=True)


@CALLBACKS.register_class
class RichModelSummary(ModelSummary):
    pass


@CALLBACKS.register_class
class Timer(Callback):
    def __init__(self, duration: Optional[str] = None, interval: str = "epoch", **_):
        self.duration_s = self._parse(duration) if duration else None
        self._start = None
        self._stop = False

    @staticmethod
    def _parse(duration: str) -> float:
        parts = [float(p) for p in str(duration).split(":")]
        while len(parts) < 4:
            parts.insert(0, 0.0)
        d, h, m, s = parts[-4:]
        return ((d * 24 + h) * 60 + m) * 60 + s

    def on_fit_start(self, trainer, task) -> None:
        self._start = time.monotonic()

    def on_epoch_end(self, trainer, task, logs) -> None:
        if self.duration_s and time.monotonic() - self._start > self.duration_s:
            self._stop = True

    def should_stop(self, trainer) -> bool:
        return self._stop


@CALLBACKS.register_class
class DeviceStatsMonitor(Callback):
    def on_epoch_end(self, trainer, task, logs) -> None:
        if trainer.logger is None:
            return
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            trainer.logger.log_metrics(
                {"device/bytes_in_use": stats.get("bytes_in_use", 0),
                 "device/peak_bytes_in_use": stats.get("peak_bytes_in_use", 0)},
                step=trainer.global_step)
        except Exception:  # noqa: BLE001 — stats are best-effort per backend
            pass


@CALLBACKS.register_class
class GradientAccumulationScheduler(Callback):
    """Accepted for config parity; static accumulation is configured via
    trainer.accumulate_grad_batches (dynamic scheduling not yet supported)."""

    def __init__(self, scheduling: Optional[dict] = None, **_):
        self.scheduling = scheduling or {}

    def setup(self, trainer, task) -> None:
        if self.scheduling:
            first = sorted(self.scheduling.items())[0]
            logger.warning("GradientAccumulationScheduler: dynamic scheduling not "
                           "supported; using accumulate_grad_batches=%s", first[1])


@CALLBACKS.register_class
class StochasticWeightAveraging(Callback):
    """SWA (reference registers Lightning's StochasticWeightAveraging,
    callbacks/__init__.py:21). Functional formulation: keep a running average
    of the parameter pytree from ``swa_epoch_start`` on; at fit end swap the
    average in and refresh BatchNorm statistics with a forward sweep over a
    few training batches (the Lightning BN-update pass)."""

    def __init__(self, swa_epoch_start=0.8, swa_lrs=None,
                 annealing_epochs: int = 10, bn_update_steps: int = 10, **_):
        self.swa_epoch_start = swa_epoch_start
        self.bn_update_steps = bn_update_steps
        self._avg = None
        self._count = 0
        self._update_avg = None  # one persistent jitted averager

    def _start_epoch(self, trainer) -> int:
        if isinstance(self.swa_epoch_start, float) and self.swa_epoch_start < 1:
            return int(trainer.max_epochs * self.swa_epoch_start)
        return int(self.swa_epoch_start)

    def on_train_epoch_end(self, trainer, task, logs) -> None:
        import jax
        if trainer.current_epoch < self._start_epoch(trainer):
            return
        params = trainer.state.params
        if self._avg is None:
            # deep-copy: train_step donates its input state, so aliasing
            # trainer.state.params here would reference deleted buffers
            import jax.numpy as jnp
            self._avg = jax.tree_util.tree_map(jnp.array, params)
            self._count = 1
            return
        if self._update_avg is None:
            # n is a traced argument: one compile covers every epoch
            @jax.jit
            def update_avg(avg, new, n):
                return jax.tree_util.tree_map(
                    lambda a, p: (a * n + p) / (n + 1.0), avg, new)
            self._update_avg = update_avg
        import jax.numpy as jnp
        self._avg = self._update_avg(self._avg, params,
                                     jnp.float32(self._count))
        self._count += 1

    def on_fit_end(self, trainer, task) -> None:
        if self._avg is None:
            return
        import jax
        trainer.state = trainer.state.replace(params=self._avg)
        # BN-statistics refresh with the averaged weights
        if trainer.state.batch_stats and self.bn_update_steps > 0:
            loaders = task.train_dataloader()
            if loaders:
                # fresh loaders carry no device pipeline: install it so BN
                # sees normalized/resized batches, exactly as in training
                trainer._install_device_fns(loaders[:1], train=True)
                model = task.model
                variables = {"params": trainer.state.params,
                             "batch_stats": trainer.state.batch_stats}

                buffers = trainer.state.buffers

                @jax.jit
                def bn_step(bs, batch):
                    variables = {"params": trainer.state.params,
                                 "batch_stats": bs}
                    mutable = ["batch_stats"]
                    if buffers:  # stateful heads (ArcFace step counter)
                        variables["buffers"] = buffers
                        mutable.append("buffers")
                    _, new_vars = model.apply(
                        variables, batch, train=True,
                        rngs={"dropout": jax.random.PRNGKey(0)},
                        mutable=mutable)
                    return new_vars["batch_stats"]

                bs = trainer.state.batch_stats
                for i, batch in enumerate(loaders[0]):
                    if i >= self.bn_update_steps:
                        break
                    bs = bn_step(bs, batch)
                trainer.state = trainer.state.replace(batch_stats=bs)
        logger.info("SWA: swapped in averaged weights (%d snapshots)", self._count)


@CALLBACKS.register_class
class ModelPruning(Callback):
    """Magnitude pruning (reference registers Lightning's ModelPruning,
    callbacks/__init__.py:16). Functional formulation: at each configured
    epoch, zero the smallest-|w| fraction of every 2D+ kernel and freeze
    those positions by folding the mask into ``state.grad_mask`` — pruned
    weights stay zero for the rest of training."""

    def __init__(self, amount: float = 0.5, apply_pruning=True,
                 make_pruning_permanent: bool = True,
                 prune_on_epoch: int = 0, **_):
        self.amount = amount
        self.apply_pruning = apply_pruning
        self.prune_on_epoch = prune_on_epoch
        self._mask = None  # fixed after the first prune

    def on_train_epoch_end(self, trainer, task, logs) -> None:
        import jax
        import jax.numpy as jnp
        if not self.apply_pruning or trainer.current_epoch < self.prune_on_epoch:
            return
        if self._mask is not None:
            # mask already chosen: re-apply it. Stateful optimizers (Adam
            # momentum, decoupled weight decay) can drift pruned weights
            # within an epoch; the fixed mask re-zeroes them here so the
            # shipped model keeps the selected sparsity pattern.
            reapply = jax.jit(lambda p, m: jax.tree_util.tree_map(
                lambda pp, mm: pp * mm, p, m))
            trainer.state = trainer.state.replace(
                params=reapply(trainer.state.params, self._mask))
            return
        amount = self.amount

        @jax.jit
        def prune(params, grad_mask):
            def leaf(p, m):
                if p.ndim < 2:  # biases / norms stay dense
                    return p, m
                mag = jnp.abs(p).reshape(-1)
                k = int(mag.shape[0] * amount)
                if k == 0:
                    return p, m
                threshold = jnp.sort(mag)[k - 1]
                keep = (jnp.abs(p) > threshold).astype(p.dtype)
                return p * keep, m * keep

            flat_p, treedef = jax.tree_util.tree_flatten(params)
            flat_m = treedef.flatten_up_to(grad_mask)
            out = [leaf(p, jnp.broadcast_to(m, p.shape)) for p, m in zip(flat_p, flat_m)]
            new_p = jax.tree_util.tree_unflatten(treedef, [a for a, _ in out])
            new_m = jax.tree_util.tree_unflatten(treedef, [b for _, b in out])
            return new_p, new_m

        new_params, new_mask = prune(trainer.state.params, trainer.state.grad_mask)
        # materialized copies: new_mask becomes state.grad_mask, which is
        # donated into the next train_step — aliasing it would leave _mask
        # pointing at deleted buffers
        self._mask = jax.tree_util.tree_map(
            lambda p, m: jnp.array(jnp.broadcast_to(m, p.shape)),
            new_params, new_mask)
        trainer.state = trainer.state.replace(params=new_params,
                                              grad_mask=new_mask)
