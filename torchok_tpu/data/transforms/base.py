"""Transform engine.

The reference composes Albumentations ops from YAML (reference:
torchok/constructor/constructor.py:325-358, torchok/data/transforms/__init__.py:24-116).
This module re-implements that surface TPU-first:

* every transform keeps the Albumentations calling convention
  ``t(image=..., mask=...) -> dict`` for the host path;
* transforms that are pure photometry / flips additionally implement a
  *batched device* path (``apply_batch``, jnp over NHWC batches with
  per-sample RNG) — ``Compose.split_device_suffix`` peels the maximal
  suffix of device-capable ops so they run on-TPU fused ahead of the train
  step instead of per-sample on CPU workers (SURVEY.md §7.4);
* randomness on the host path uses a per-Compose ``numpy.random.Generator``
  reseedable for determinism; on the device path a folded-in JAX key.
"""
from __future__ import annotations

import threading as _threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from torchok_tpu.constructor import TRANSFORMS


class BaseTransform:
    """Albumentations-compatible single transform."""

    # True when apply_batch (jnp, NHWC batch) is implemented
    device_capable: bool = False
    # False for device ops that change geometry (flips) and would need to
    # update bboxes — excluded from the device suffix for bbox datasets
    device_bbox_safe: bool = True
    # True for device ops that require all samples to share the input shape
    # (batched geometry like Resize) — only moved to device when the dataset
    # declares uniform_image_size
    device_needs_uniform: bool = False
    # False for device ops whose apply_batch changes the image dtype
    # (ToFloat/FromFloat/Normalize/ToTensorV2): selecting containers
    # (OneOf/SomeOf) blend child outputs per sample, which requires every
    # child to preserve shape AND dtype — such containers stay on the host
    # path instead of raising at jit-trace time (ADVICE r4)
    device_preserves_dtype: bool = True
    # True when the op is deterministic (p is ignored / always applied)
    always_apply: bool = False
    # True for ops that change image geometry (resize/crop/flip/warp…): such
    # an op MUST override apply_to_bboxes, otherwise passing bboxes through
    # it raises — a silent identity would misalign GT boxes (the reference
    # gets this via albumentations BboxParams; we enforce it structurally)
    geometric: bool = False

    def __init__(self, always_apply: bool = False, p: float = 0.5):
        # p is a property over `p_base` (underscore-free so it stays visible
        # to the trainer's vars()-based pipeline freeze): selecting
        # containers force children at trace time through a per-thread flag
        # rather than by mutating shared state (ADVICE r4)
        self.p = 1.0 if (always_apply or self.always_apply) else p
        self._base_seed: Optional[int] = None
        self._local = _threading.local()

    @property
    def p(self) -> float:
        local = getattr(self, "_local", None)
        if local is not None and getattr(local, "force_batch", 0):
            return 1.0
        return self.p_base

    @p.setter
    def p(self, value: float) -> None:
        self.p_base = float(value)

    def seed(self, seed: int) -> None:
        self._base_seed = int(seed)
        self._local = _threading.local()  # reset all per-thread streams

    @property
    def rng(self) -> np.random.Generator:
        """Per-thread RNG: loader worker threads run transforms concurrently
        and np.random.Generator is not thread-safe; each thread gets its own
        stream derived from (seed, thread id). Deterministic per thread."""
        r = getattr(self._local, "rng", None)
        if r is None:
            if self._base_seed is None:
                r = np.random.default_rng()
            else:
                ss = np.random.SeedSequence(
                    [self._base_seed & 0x7FFFFFFFFFFFFFFF,
                     _threading.get_ident() & 0x7FFFFFFFFFFFFFFF])
                r = np.random.default_rng(ss)
            self._local.rng = r
        return r

    # ------------------------------ host path ------------------------------
    def __call__(self, force_apply: bool = False, **sample) -> Dict[str, Any]:
        if force_apply or self.p >= 1.0 or self.rng.random() < self.p:
            params = self.get_params(sample)
            out = dict(sample)
            if "image" in sample:
                out["image"] = self.apply(sample["image"], **params)
            if "mask" in sample and sample["mask"] is not None:
                out["mask"] = self.apply_to_mask(sample["mask"], **params)
            if "bboxes" in sample and sample["bboxes"] is not None:
                if self.geometric and \
                        type(self).apply_to_bboxes is BaseTransform.apply_to_bboxes:
                    raise NotImplementedError(
                        f"{type(self).__name__} changes image geometry but has "
                        f"no bbox handler; it cannot be used in a pipeline that "
                        f"carries bboxes (detection datasets)")
                out["bboxes"] = self.apply_to_bboxes(
                    sample["bboxes"], sample["image"].shape, **params)
            return out
        return dict(sample)

    def get_params(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        return {}

    def apply(self, image: np.ndarray, **params) -> np.ndarray:
        raise NotImplementedError

    def apply_to_mask(self, mask: np.ndarray, **params) -> np.ndarray:
        return mask

    def apply_to_bboxes(self, bboxes, image_shape, **params):
        return bboxes

    # ----------------------------- device path -----------------------------
    def apply_batch(self, batch: Dict[str, Any], rng) -> Dict[str, Any]:
        """Batched on-device application; only for device_capable transforms.

        ``batch['image']`` is an NHWC jnp array; ``rng`` a JAX PRNG key unique
        per (step, transform).
        """
        raise NotImplementedError


def _children_device_capable(transforms, allow_needs_uniform: bool,
                             require_dtype_preserving: bool = False) -> bool:
    if not transforms:
        return False
    for t in transforms:
        if not t.device_capable:
            return False
        if t.device_needs_uniform and not allow_needs_uniform:
            return False
        if require_dtype_preserving and not t.device_preserves_dtype:
            return False
    return True


def _forced_batch(t: BaseTransform, batch, rng):
    """Apply a child transform with its gate forced to 1 — the device
    analogue of the host path's ``force_apply=True`` on a chosen OneOf
    child. Uses a per-thread counter consulted by the ``p`` property
    instead of mutating shared ``t.p`` (re-entrant and safe under
    concurrent retraces of a shared pipeline; ADVICE r4)."""
    local = t._local
    prev = getattr(local, "force_batch", 0)
    local.force_batch = prev + 1
    try:
        return t.apply_batch(batch, rng)
    finally:
        local.force_batch = prev


def _children_device_bbox_safe(transforms) -> bool:
    return all(t.device_bbox_safe
               and not (t.geometric
                        and type(t).apply_to_bboxes is BaseTransform.apply_to_bboxes)
               for t in transforms)


def _select_batch(base, out, sel, keys=("image", "mask")):
    """Per-sample select between two batch dicts. Children of a selecting
    container must preserve shape AND dtype — checked at trace time."""
    import jax.numpy as jnp
    merged = dict(base)
    for k in keys:
        if k in base and base[k] is not None:
            a, b = base[k], out[k]
            if a.shape != b.shape or a.dtype != b.dtype:
                raise TypeError(
                    f"device OneOf/SomeOf children must preserve the batch "
                    f"shape and dtype; '{k}' changed "
                    f"{a.shape}/{a.dtype} -> {b.shape}/{b.dtype} — keep this "
                    f"composition on the host path")
            s = sel.reshape((sel.shape[0],) + (1,) * (a.ndim - 1))
            merged[k] = jnp.where(s, b, a)
    return merged


@TRANSFORMS.register_class
class Compose(BaseTransform):
    always_apply = True

    def __init__(self, transforms: Sequence[BaseTransform], p: float = 1.0, **_ignored):
        super().__init__(p=p)
        self.transforms = list(transforms)

    # -- nested-container device path: a Compose whose children are all
    # device-capable is itself device-capable, so pipelines that wrap their
    # photometric block in Compose/Sequential still move it to the device
    @property
    def device_capable(self):
        return _children_device_capable(self.transforms, allow_needs_uniform=True)

    @property
    def device_needs_uniform(self):
        return any(t.device_needs_uniform for t in self.transforms)

    @property
    def device_bbox_safe(self):
        return _children_device_bbox_safe(self.transforms)

    @property
    def device_preserves_dtype(self):
        return all(t.device_preserves_dtype for t in self.transforms)

    def apply_batch(self, batch, rng):
        import jax
        keys = jax.random.split(rng, max(len(self.transforms), 1))
        for t, k in zip(self.transforms, keys):
            batch = t.apply_batch(batch, k)
        return batch

    def seed(self, seed: int) -> None:
        super().seed(seed)
        for i, t in enumerate(self.transforms):
            t.seed(seed * 1_000_003 + i)

    def __call__(self, force_apply: bool = False, **sample) -> Dict[str, Any]:
        for t in self.transforms:
            sample = t(**sample)
        return sample

    def split_device_suffix(self, bbox_mode: bool = False,
                            uniform_shapes: bool = False) -> Tuple["Compose", List[BaseTransform]]:
        """Split into (host prefix, device-capable suffix). In bbox_mode only
        geometry-preserving device ops may move to the device; shape-changing
        batched ops (Resize) move only for uniform-size datasets."""
        def ok(t):
            # A geometric op with no bbox handler must NOT move to the device
            # in bbox mode regardless of its device_bbox_safe flag: the host
            # path raises loudly (geometric guard in __call__) while the
            # device path would silently warp pixels under untouched GT boxes.
            bbox_ok = t.device_bbox_safe and not (
                t.geometric
                and type(t).apply_to_bboxes is BaseTransform.apply_to_bboxes)
            return (t.device_capable
                    and (not bbox_mode or bbox_ok)
                    and (uniform_shapes or not t.device_needs_uniform))
        split = len(self.transforms)
        while split > 0 and ok(self.transforms[split - 1]):
            split -= 1
        host = Compose(self.transforms[:split], p=1.0)
        return host, self.transforms[split:]


@TRANSFORMS.register_class
class OneOf(BaseTransform):
    def __init__(self, transforms: Sequence[BaseTransform], p: float = 0.5, **_ignored):
        super().__init__(p=p)
        self.transforms = list(transforms)
        probs = np.array([getattr(t, "p", 1.0) for t in self.transforms], dtype=np.float64)
        self.probs = probs / probs.sum() if probs.sum() > 0 else None

    def seed(self, seed: int) -> None:
        super().seed(seed)
        for i, t in enumerate(self.transforms):
            t.seed(seed * 999_983 + i)

    def __call__(self, force_apply: bool = False, **sample) -> Dict[str, Any]:
        if self.transforms and (force_apply or self.rng.random() < self.p):
            idx = self.rng.choice(len(self.transforms), p=self.probs)
            return self.transforms[idx](force_apply=True, **sample)
        return dict(sample)

    # -- device path: run every child on the whole batch (forced, like the
    # host's force_apply=True on the chosen child) and select per sample.
    # Children must preserve shape+dtype (checked in _select_batch), hence
    # the needs-uniform AND dtype-preserving exclusions below: a OneOf over
    # a dtype-changing child (ToFloat/FromFloat/Normalize) simply stays on
    # the host path instead of raising at trace time.
    @property
    def device_capable(self):
        return _children_device_capable(self.transforms, allow_needs_uniform=False,
                                        require_dtype_preserving=True)

    @property
    def device_bbox_safe(self):
        return _children_device_bbox_safe(self.transforms)

    @property
    def device_preserves_dtype(self):
        return all(t.device_preserves_dtype for t in self.transforms)

    def apply_batch(self, batch, rng):
        import jax
        import jax.numpy as jnp
        n = batch["image"].shape[0]
        keys = jax.random.split(rng, 2 + len(self.transforms))
        gate = jax.random.uniform(keys[0], (n,)) < self.p
        probs = None if self.probs is None else jnp.asarray(self.probs)
        choice = jax.random.choice(keys[1], len(self.transforms), (n,), p=probs)
        out = dict(batch)
        for i, t in enumerate(self.transforms):
            # trace-time force, mirroring host force_apply=True on the
            # chosen child — via the per-thread flag, not by mutating t.p
            o = _forced_batch(t, dict(batch), keys[2 + i])
            out = _select_batch(out, o, gate & (choice == i))
        return out


@TRANSFORMS.register_class
class SomeOf(BaseTransform):
    def __init__(self, transforms: Sequence[BaseTransform], n: int = 1,
                 replace: bool = True, p: float = 1.0, **_ignored):
        super().__init__(p=p)
        self.transforms = list(transforms)
        self.n = n
        self.replace = replace

    def seed(self, seed: int) -> None:
        super().seed(seed)
        for i, t in enumerate(self.transforms):
            t.seed(seed * 999_979 + i)

    def __call__(self, force_apply: bool = False, **sample) -> Dict[str, Any]:
        if self.rng.random() < self.p:
            idxs = self.rng.choice(len(self.transforms), size=self.n, replace=self.replace)
            for i in idxs:
                sample = self.transforms[int(i)](**sample)
        return dict(sample)

    # -- device path for the n=1 case only: one uniformly-chosen child per
    # sample, applied with ITS OWN p (host SomeOf does not force children).
    # n>1 would need per-sample ordered composition, which has no batched
    # equivalent — those stay on host.
    @property
    def device_capable(self):
        return self.n == 1 and _children_device_capable(
            self.transforms, allow_needs_uniform=False,
            require_dtype_preserving=True)

    @property
    def device_bbox_safe(self):
        return _children_device_bbox_safe(self.transforms)

    @property
    def device_preserves_dtype(self):
        return all(t.device_preserves_dtype for t in self.transforms)

    def apply_batch(self, batch, rng):
        import jax
        n = batch["image"].shape[0]
        keys = jax.random.split(rng, 2 + len(self.transforms))
        gate = jax.random.uniform(keys[0], (n,)) < self.p
        choice = jax.random.randint(keys[1], (n,), 0, len(self.transforms))
        out = dict(batch)
        for i, t in enumerate(self.transforms):
            o = t.apply_batch(dict(batch), keys[2 + i])
            out = _select_batch(out, o, gate & (choice == i))
        return out


@TRANSFORMS.register_class
class Sequential(Compose):
    pass


@TRANSFORMS.register_class
class NoOp(BaseTransform):
    always_apply = True
    device_capable = True

    def apply(self, image, **params):
        return image

    def apply_batch(self, batch, rng):
        del rng  # identity regardless of p, like the host path
        return batch
