"""Threaded prefetching data loader.

TPU-native replacement for torch DataLoader + Lightning's loop plumbing
(reference: torchok/constructor/constructor.py:293-308). Design:

* worker *threads*, not processes — the hot per-sample work is cv2/numpy and
  the first-party native decoder, all of which release the GIL, so threads
  give parallel decode without the spawn/pickle overhead of worker
  processes; ``num_workers: 0`` means fully synchronous loading (torch
  semantics);
* batches are collated to numpy, then ``device_put`` with a batch-axis
  sharding (handed in by the engine) and pushed through the dataset's
  batched on-device transform suffix under jit;
* double buffering: ``prefetch_factor`` batches are in flight on host and
  one device batch is prefetched ahead of the consumer, overlapping host
  decode + PCIe transfer with TPU compute;
* producer exceptions propagate to the consumer (a crashed worker fails the
  epoch loudly instead of silently truncating it), and early consumer exit
  (limit_*_batches, max_steps, sanity validation) drains the queue so the
  producer thread always terminates promptly.
"""
from __future__ import annotations

import queue as queue_mod
from collections import deque
import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import (Any, Callable, Dict, Iterator, List, Optional, Sequence,
                    Tuple)

import numpy as np

_SENTINEL = object()


def default_collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    batch: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        first = vals[0]
        if isinstance(first, np.ndarray):
            batch[key] = np.stack(vals)
        elif isinstance(first, (bool, np.bool_)):
            # bool before int: Python bool is an int subclass
            batch[key] = np.asarray(vals, dtype=bool)
        elif isinstance(first, (int, np.integer)):
            batch[key] = np.asarray(vals, dtype=np.int64)
        elif isinstance(first, (float, np.floating)):
            batch[key] = np.asarray(vals, dtype=np.float32)
        else:
            batch[key] = vals  # ragged / metadata: keep as list
    return batch


class DataLoader:
    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 drop_last: bool = False, num_workers: Optional[int] = None,
                 sampler=None, collate_fn: Optional[Callable] = None,
                 prefetch_factor: int = 2, device_prefetch: int = 2,
                 seed: int = 0, process_shard: bool = False, **_ignored):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        # torch semantics: 0 = synchronous in-thread loading; None = default
        self.num_workers = 4 if num_workers is None else max(0, int(num_workers))
        self.sampler = sampler
        self.collate_fn = collate_fn or getattr(dataset, "collate_fn", None) or default_collate
        self.prefetch_factor = max(1, prefetch_factor)
        # device-side pipeline depth: batches already dispatched (device_put
        # is async) but not yet handed to the consumer. On slow host->device
        # links (the tunneled chip here, ~40 MB/s) depth 2-3 hides transfer
        # jitter behind compute; on PCIe hosts 1-2 suffices.
        self.device_prefetch = max(1, device_prefetch)
        self.seed = seed
        # multi-host training: this process reads only its 1/world slice of
        # each epoch's index order (torch DistributedSampler semantics:
        # wrap-pad to a multiple of world, then stride by rank). batch_size
        # stays PER-PROCESS; the engine assembles the global batch with
        # jax.make_array_from_process_local_data.
        self.process_shard = process_shard
        self.epoch = 0
        # engine-installed: converts a numpy host batch into a sharded device
        # batch with the on-device transform suffix applied
        self.device_fn: Optional[Callable[[Dict[str, Any], int], Any]] = None

    @staticmethod
    def _world() -> Tuple[int, int]:
        """(rank, world) of the jax runtime; (0, 1) single-process."""
        import jax
        try:
            return jax.process_index(), jax.process_count()
        except Exception:  # jax not initialized yet (pure host-side tests)
            return 0, 1

    def __len__(self) -> int:
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.process_shard:
            rank, world = self._world()
            if world > 1:
                n = (n + world - 1) // world  # wrap-padded shard length
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if hasattr(self.dataset, "seed"):
            self.dataset.seed(self.seed * 1_000_003 + epoch)
        # torch sampler protocol: epoch-deterministic sampling orders
        if self.sampler is not None and hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)

    def _index_batches(self) -> List[np.ndarray]:
        if self.sampler is not None:
            order = np.fromiter(iter(self.sampler), dtype=np.int64)
        else:
            order = np.arange(len(self.dataset))
            if self.shuffle:
                rng = np.random.default_rng(self.seed * 7_368_787 + self.epoch)
                rng.shuffle(order)
        if self.process_shard:
            rank, world = self._world()
            if world > 1:
                pad = (-len(order)) % world
                if pad:  # wrap-pad so every rank sees the same step count
                    order = np.concatenate([order, order[:pad]])
                order = order[rank::world]
        n_full = len(order) // self.batch_size
        batches = [order[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_full)]
        rem = len(order) - n_full * self.batch_size
        if rem and not self.drop_last:
            batches.append(order[n_full * self.batch_size:])
        return batches

    @property
    def _vectorized(self) -> bool:
        return (hasattr(self.dataset, "get_batch")
                and getattr(self.dataset, "host_pipeline_empty", False)
                and self.collate_fn is default_collate)

    def _fetch(self, idxs: np.ndarray) -> Dict[str, Any]:
        if self._vectorized:
            return self.dataset.get_batch(idxs)
        samples = [self.dataset[int(i)] for i in idxs]
        return self.collate_fn(samples)

    def _fetch_parallel(self, pool: Optional[ThreadPoolExecutor],
                        idxs: np.ndarray) -> Dict[str, Any]:
        if pool is None or self._vectorized or len(idxs) < 2 * self.num_workers:
            return self._fetch(idxs)
        chunks = np.array_split(idxs, self.num_workers)
        parts = list(pool.map(lambda c: [self.dataset[int(i)] for i in c], chunks))
        samples = [s for part in parts for s in part]
        return self.collate_fn(samples)

    def _iter_sync(self, batches) -> Iterator[Any]:
        for step, idxs in enumerate(batches):
            host_batch = self._fetch(idxs)
            if self.device_fn is not None:
                yield self.device_fn(host_batch, self.epoch * len(batches) + step)
            else:
                yield host_batch

    def __iter__(self) -> Iterator[Any]:
        batches = self._index_batches()
        if self.num_workers == 0:
            yield from self._iter_sync(batches)
            return

        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        q: Queue = Queue(maxsize=self.prefetch_factor)
        stop = threading.Event()

        def producer():
            try:
                for step, idxs in enumerate(batches):
                    if stop.is_set():
                        return
                    item = (step, self._fetch_parallel(pool, idxs))
                    # bounded put that re-checks stop: the consumer may have
                    # exited early (limit_*_batches) with the queue full
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue_mod.Full:
                            continue
            except BaseException as exc:  # noqa: BLE001 — propagate to consumer
                while not stop.is_set():
                    try:
                        q.put(("__error__", exc), timeout=0.1)
                        return
                    except queue_mod.Full:
                        continue
            finally:
                while not stop.is_set():
                    try:
                        q.put(_SENTINEL, timeout=0.1)
                        break
                    except queue_mod.Full:
                        continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            pending: deque = deque()  # device-side prefetch pipeline
            depth = self.device_prefetch
            while True:
                item = q.get()
                if item is _SENTINEL:
                    break
                step, host_batch = item
                if step == "__error__":
                    raise host_batch  # producer exception, re-raised here
                if self.device_fn is not None:
                    dev = self.device_fn(host_batch, self.epoch * len(batches) + step)
                else:
                    dev = host_batch
                pending.append(dev)
                if len(pending) > depth:
                    yield pending.popleft()
            while pending:
                yield pending.popleft()
        finally:
            stop.set()
            # unblock a producer waiting on a full queue, then reap it
            while True:
                try:
                    q.get_nowait()
                except queue_mod.Empty:
                    break
            t.join(timeout=5)
            pool.shutdown(wait=False)


class CombinedTrainLoader:
    """Round-robin interleaving of several TRAIN loaders.

    The reference returns a list of train dataloaders (torchok
    tasks/base.py:60-68) and leans on Lightning's CombinedLoader. Lightning's
    default delivers a *list* of batches per step, which no reference task's
    ``forward_with_gt`` can consume and which would force one jitted step
    over a heterogeneous pytree. Here each step yields ONE loader's dict
    batch (stable pytree per loader -> at most one XLA executable each):

    * ``max_size_cycle`` (default, Lightning's default name): shorter loaders
      restart, batches interleave round-robin; epoch length =
      n_loaders * max(len(loader)). (Lightning zips the loaders into one
      multi-batch per step; interleaving is the single-dict-batch analog.)
    * ``sequential`` (Lightning 2.x CombinedLoader semantics): loaders are
      consumed one after another, each fully; epoch length =
      sum(len(loader)).
    """

    def __init__(self, loaders: Sequence, mode: str = "max_size_cycle"):
        if mode not in ("max_size_cycle", "sequential"):
            raise ValueError(f"unknown multiple_trainloader_mode: {mode!r}")
        if not loaders:
            raise ValueError("CombinedTrainLoader needs at least one loader")
        # steps_per_execution support: when > 1, K consecutive (interleaved)
        # batches are concatenated along the batch axis into one super-batch
        # that the engine's fused lax.scan splits back into K micro steps —
        # the optimizer-step sequence is identical to the unfused loop.
        # Requires all loaders to produce structurally identical batches
        # (same keys/shapes/dtypes); the engine checks batch sizes and the
        # concat below raises a descriptive error on structural mismatch.
        self.superbatch_k = 1
        for i, ld in enumerate(loaders):
            if len(ld) == 0:
                raise ValueError(
                    f"TRAIN dataloader #{i} yields zero batches (dataset "
                    "smaller than batch_size with drop_last?); combined "
                    "train loading needs every loader non-empty")
        self.loaders = list(loaders)
        self.mode = mode
        self.epoch = 0

    @property
    def batch_size(self) -> int:
        # used by the engine only for throughput accounting; heterogeneous
        # batch sizes make images_per_sec approximate
        return self.loaders[0].batch_size

    @property
    def dataset(self):
        return self.loaders[0].dataset

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        for ld in self.loaders:
            ld.set_epoch(epoch)

    @staticmethod
    def _pass_sizes(ld) -> List[int]:
        """Batch sizes of one full pass over ``ld``, in yield order."""
        n = len(ld.sampler) if getattr(ld, "sampler", None) is not None \
            else len(ld.dataset)
        bs = ld.batch_size
        sizes = [bs] * (n // bs)
        rem = n % bs
        if rem and not getattr(ld, "drop_last", False):
            sizes.append(rem)
        return sizes

    def _base_size_seq(self) -> List[int]:
        """Batch sizes ``_iter_base`` will yield this epoch, in order."""
        per_loader = [self._pass_sizes(ld) for ld in self.loaders]
        if self.mode == "sequential":
            return [s for sizes in per_loader for s in sizes]
        # max_size_cycle: every loader serves exactly ``target`` batches,
        # cycling its own pass (restarts reshuffle but keep the size pattern)
        target = max(len(ld) for ld in self.loaders)
        seq: List[int] = []
        for r in range(target):
            for sizes in per_loader:
                seq.append(sizes[r % len(sizes)])
        return seq

    def __len__(self) -> int:
        if self.superbatch_k <= 1:
            if self.mode == "sequential":
                return sum(len(ld) for ld in self.loaders)
            return len(self.loaders) * max(len(ld) for ld in self.loaders)
        # exact superbatch count: ragged constituents flush the current group
        # early and pass through solo (_iter_superbatched), so a plain
        # ceil(n/k) undercounts and the engine would drop trailing batches
        micro, k = self.batch_size, self.superbatch_k
        count = grouped = 0
        for s in self._base_size_seq():
            if s != micro:
                if grouped:
                    count += 1
                    grouped = 0
                count += 1
            else:
                grouped += 1
                if grouped == k:
                    count += 1
                    grouped = 0
        if grouped:
            count += 1
        return count

    @staticmethod
    def _concat_batches(group: List[Any]) -> Any:
        if len(group) == 1:
            return group[0]
        keys = set(group[0])
        for g in group[1:]:
            if set(g) != keys:
                diff = sorted(keys.symmetric_difference(g))
                raise ValueError(
                    "steps_per_execution>1 with multiple TRAIN dataloaders "
                    "requires structurally identical batches; keys "
                    f"{diff} present in one loader's batch but not another's")
        out = {}
        for key in group[0]:
            vals = [g[key] for g in group]
            first = vals[0]
            if isinstance(first, list):
                out[key] = [x for v in vals for x in v]
            elif isinstance(first, np.ndarray):
                try:
                    out[key] = np.concatenate(vals, axis=0)
                except ValueError as e:  # mismatched trailing dims
                    raise ValueError(
                        "steps_per_execution>1 with multiple TRAIN "
                        f"dataloaders: cannot concatenate batches for key "
                        f"{key!r} ({e}); loaders must produce structurally "
                        "identical batches — set steps_per_execution: 1"
                    ) from e
            else:  # jax device arrays (post device_fn)
                import jax.numpy as jnp
                try:
                    out[key] = jnp.concatenate(vals, axis=0)
                except (TypeError, ValueError) as e:
                    raise ValueError(
                        "steps_per_execution>1 with multiple TRAIN "
                        f"dataloaders: cannot concatenate batches for key "
                        f"{key!r} ({e}); loaders must produce structurally "
                        "identical batches — set steps_per_execution: 1") from e
        return out

    def _iter_superbatched(self, it: Iterator[Any], micro: int) -> Iterator[Any]:
        group: List[Any] = []
        for batch in it:
            leaves = [v for v in batch.values()
                      if isinstance(v, np.ndarray) or hasattr(v, "shape")]
            bs = leaves[0].shape[0] if leaves else micro
            if bs != micro:
                # ragged constituent: flush what we have, pass it through solo
                if group:
                    yield self._concat_batches(group)
                    group = []
                yield batch
                continue
            group.append(batch)
            if len(group) == self.superbatch_k:
                yield self._concat_batches(group)
                group = []
        if group:
            yield self._concat_batches(group)

    def __iter__(self) -> Iterator[Any]:
        if self.superbatch_k > 1:
            yield from self._iter_superbatched(self._iter_base(),
                                               self.batch_size)
        else:
            yield from self._iter_base()

    def _iter_base(self) -> Iterator[Any]:
        if self.mode == "sequential":
            for ld in self.loaders:
                yield from ld
            return
        iters = [iter(ld) for ld in self.loaders]
        # max_size_cycle: stop when the longest loader finishes a pass;
        # shorter loaders restart in place with a FRESH shuffle seed — a bare
        # iter() would replay the identical permutation within one epoch
        target = max(len(ld) for ld in self.loaders)
        served = [0] * len(iters)
        restarts = [0] * len(iters)
        while max(served) < target:
            for i, it in enumerate(iters):
                try:
                    batch = next(it)
                except StopIteration:
                    restarts[i] += 1
                    # fold the restart count into the epoch seed (large odd
                    # stride so recycled passes never collide with a real
                    # epoch's seed); next epoch's set_epoch() resets it
                    self.loaders[i].set_epoch(self.epoch + 7919 * restarts[i])
                    iters[i] = iter(self.loaders[i])
                    batch = next(iters[i])
                served[i] += 1
                yield batch
