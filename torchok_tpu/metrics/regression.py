"""Regression metrics (reference: torchok/metrics/__init__.py:74-85)."""
from __future__ import annotations

import jax.numpy as jnp

from torchok_tpu.constructor import METRICS
from torchok_tpu.metrics.base import MeanState, Metric

__all__ = []


@METRICS.register_class(name="MeanSquaredError")
class MeanSquaredError(MeanState):
    def __init__(self, squared: bool = True, **params):
        super().__init__(**params)
        self.squared = squared

    def update(self, state, preds, target, **_):
        return self._accumulate(state, (preds.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)

    def compute(self, state):
        v = state["total"] / jnp.maximum(state["count"], 1e-12)
        return float(v if self.squared else jnp.sqrt(v))


@METRICS.register_class(name="MeanAbsoluteError")
class MeanAbsoluteError(MeanState):
    def update(self, state, preds, target, **_):
        return self._accumulate(state, jnp.abs(preds.astype(jnp.float32) - target.astype(jnp.float32)))


@METRICS.register_class(name="MeanAbsolutePercentageError")
class MeanAbsolutePercentageError(MeanState):
    def update(self, state, preds, target, **_):
        t = target.astype(jnp.float32)
        return self._accumulate(state, jnp.abs((preds.astype(jnp.float32) - t) /
                                               jnp.clip(jnp.abs(t), 1.17e-6, None)))


@METRICS.register_class(name="MeanSquaredLogError")
class MeanSquaredLogError(MeanState):
    def update(self, state, preds, target, **_):
        return self._accumulate(state, (jnp.log1p(preds.astype(jnp.float32)) -
                                        jnp.log1p(target.astype(jnp.float32))) ** 2)


@METRICS.register_class(name="CosineSimilarity")
class CosineSimilarity(MeanState):
    def __init__(self, reduction: str = "mean", **params):
        super().__init__(**params)

    def update(self, state, preds, target, **_):
        p = preds.reshape(preds.shape[0], -1).astype(jnp.float32)
        t = target.reshape(target.shape[0], -1).astype(jnp.float32)
        cos = jnp.sum(p * t, -1) / (jnp.linalg.norm(p, axis=-1) * jnp.linalg.norm(t, axis=-1) + 1e-12)
        return self._accumulate(state, cos)


@METRICS.register_class(name="ExplainedVariance")
class ExplainedVariance(Metric):
    def empty_state(self):
        z = jnp.zeros((), jnp.float32)
        return {"n": z, "sum_t": z, "sum_t2": z, "sum_e": z, "sum_e2": z}

    def update(self, state, preds, target, **_):
        e = (target - preds).astype(jnp.float32).reshape(-1)
        t = target.astype(jnp.float32).reshape(-1)
        return {"n": state["n"] + t.size,
                "sum_t": state["sum_t"] + jnp.sum(t),
                "sum_t2": state["sum_t2"] + jnp.sum(t ** 2),
                "sum_e": state["sum_e"] + jnp.sum(e),
                "sum_e2": state["sum_e2"] + jnp.sum(e ** 2)}

    def compute(self, state):
        n = jnp.maximum(state["n"], 1.0)
        var_t = state["sum_t2"] / n - (state["sum_t"] / n) ** 2
        var_e = state["sum_e2"] / n - (state["sum_e"] / n) ** 2
        return float(1.0 - var_e / jnp.maximum(var_t, 1e-12))


@METRICS.register_class(name="R2Score")
class R2Score(Metric):
    def empty_state(self):
        z = jnp.zeros((), jnp.float32)
        return {"n": z, "sum_t": z, "sum_t2": z, "ss_res": z}

    def update(self, state, preds, target, **_):
        p = preds.astype(jnp.float32).reshape(-1)
        t = target.astype(jnp.float32).reshape(-1)
        return {"n": state["n"] + t.size,
                "sum_t": state["sum_t"] + jnp.sum(t),
                "sum_t2": state["sum_t2"] + jnp.sum(t ** 2),
                "ss_res": state["ss_res"] + jnp.sum((t - p) ** 2)}

    def compute(self, state):
        n = jnp.maximum(state["n"], 1.0)
        ss_tot = state["sum_t2"] - state["sum_t"] ** 2 / n
        return float(1.0 - state["ss_res"] / jnp.maximum(ss_tot, 1e-12))


@METRICS.register_class(name="PearsonCorrCoef")
class PearsonCorrCoef(Metric):
    def empty_state(self):
        z = jnp.zeros((), jnp.float32)
        return {"n": z, "sx": z, "sy": z, "sxx": z, "syy": z, "sxy": z}

    def update(self, state, preds, target, **_):
        x = preds.astype(jnp.float32).reshape(-1)
        y = target.astype(jnp.float32).reshape(-1)
        return {"n": state["n"] + x.size, "sx": state["sx"] + jnp.sum(x),
                "sy": state["sy"] + jnp.sum(y), "sxx": state["sxx"] + jnp.sum(x ** 2),
                "syy": state["syy"] + jnp.sum(y ** 2), "sxy": state["sxy"] + jnp.sum(x * y)}

    def compute(self, state):
        n = jnp.maximum(state["n"], 1.0)
        cov = state["sxy"] / n - state["sx"] * state["sy"] / n ** 2
        vx = state["sxx"] / n - (state["sx"] / n) ** 2
        vy = state["syy"] / n - (state["sy"] / n) ** 2
        return float(cov / jnp.maximum(jnp.sqrt(vx * vy), 1e-12))


@METRICS.register_class(name="SpearmanCorrCoef")
class SpearmanCorrCoef(Metric):
    """Spearman needs full score lists; state is concatenated on host."""

    jittable_update = False

    def empty_state(self):
        return {"preds": [], "target": []}

    def update(self, state, preds, target, **_):
        state["preds"].append(jnp.asarray(preds).reshape(-1))
        state["target"].append(jnp.asarray(target).reshape(-1))
        return state

    def compute(self, state):
        import numpy as np
        from scipy import stats
        p = np.concatenate([np.asarray(v) for v in state["preds"]])
        t = np.concatenate([np.asarray(v) for v in state["target"]])
        return float(stats.spearmanr(p, t).statistic)


@METRICS.register_class(name="SymmetricMeanAbsolutePercentageError")
class SymmetricMeanAbsolutePercentageError(MeanState):
    def update(self, state, preds, target, **_):
        p = preds.astype(jnp.float32)
        t = target.astype(jnp.float32)
        v = 2.0 * jnp.abs(p - t) / jnp.maximum(jnp.abs(p) + jnp.abs(t), 1e-8)
        return self._accumulate(state, v)


@METRICS.register_class(name="WeightedMeanAbsolutePercentageError")
class WeightedMeanAbsolutePercentageError(Metric):
    def empty_state(self):
        return {"abs_err": jnp.zeros((), jnp.float32),
                "abs_target": jnp.zeros((), jnp.float32)}

    def update(self, state, preds, target, **_):
        p = preds.astype(jnp.float32)
        t = target.astype(jnp.float32)
        return {"abs_err": state["abs_err"] + jnp.sum(jnp.abs(p - t)),
                "abs_target": state["abs_target"] + jnp.sum(jnp.abs(t))}

    def compute(self, state):
        return float(state["abs_err"] / jnp.maximum(state["abs_target"], 1e-8))


@METRICS.register_class(name="TweedieDevianceScore")
class TweedieDevianceScore(MeanState):
    def __init__(self, power: float = 0.0, **params):
        super().__init__(**params)
        self.power = power

    def update(self, state, preds, target, **_):
        p = jnp.maximum(preds.astype(jnp.float32), 1e-8)
        t = target.astype(jnp.float32)
        power = self.power
        if power == 0:
            dev = (t - p) ** 2
        elif power == 1:
            dev = 2 * (t * jnp.log(jnp.maximum(t, 1e-8) / p) - (t - p))
        elif power == 2:
            dev = 2 * (jnp.log(p / jnp.maximum(t, 1e-8)) +
                       t / p - 1)
        else:
            t_c = jnp.maximum(t, 0.0)
            dev = 2 * (t_c ** (2 - power) / ((1 - power) * (2 - power))
                       - t_c * p ** (1 - power) / (1 - power)
                       + p ** (2 - power) / (2 - power))
        return self._accumulate(state, dev)
