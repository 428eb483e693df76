"""Host input pipeline: sharded sampling, batching, background prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=8,
pin_memory=True)`` (``scripts/train.py:125-138``) with a TPU-shaped design:

* **Static shapes**: batches are always full (``drop_last``) so every jitted
  step reuses one executable.
* **Per-process sharding**: on multi-host TPU, each process reads only its
  ``process_index``-strided slice of the global sample permutation — the
  JAX-native replacement for DistributedSampler.
* **Background prefetch**: a worker-thread pool reads/normalizes HDF5 windows
  while the device computes, with a bounded queue for backpressure; device
  transfer can overlap compute via ``jax.device_put`` on the yielded batch.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from bubbleformer_tpu.data.dataset import BubbleForecast


class DataLoader:
    """Iterable over batched numpy samples with background prefetch."""

    def __init__(
        self,
        dataset: BubbleForecast,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 4,
        drop_last: bool = True,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reshuffle deterministically per epoch (all hosts agree)."""
        self._epoch = epoch

    def _local_indices(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        # Strided per-host shard of the shared permutation, truncated to the
        # common length: every process MUST run the same number of steps per
        # epoch or the ones with one extra batch deadlock in the collectives.
        shard = order[self.process_index :: self.process_count]
        if self.process_count > 1:
            shard = shard[: n // self.process_count]
        return shard

    def __len__(self) -> int:
        n_local = len(self._local_indices())
        if self.drop_last:
            return n_local // self.batch_size
        return (n_local + self.batch_size - 1) // self.batch_size

    def _collate(self, indices: np.ndarray):
        # Native fast path: one C/OpenMP gather for the whole batch.
        if getattr(self.dataset, "_native", False):
            return self.dataset.get_batch(indices)
        samples = list(self._pool.map(self.dataset.__getitem__, indices))
        parts = tuple(np.stack([s[i] for s in samples]) for i in range(len(samples[0])))
        return parts

    def __iter__(self) -> Iterator:
        indices = self._local_indices()
        if self.drop_last:
            usable = (len(indices) // self.batch_size) * self.batch_size
            indices = indices[:usable]
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        self._pool = ThreadPoolExecutor(max_workers=self.num_workers)

        def put_checking_stop(item) -> bool:
            # q.put with a timeout loop so a producer blocked on a full queue
            # still observes `stop` when the consumer exits early (e.g. the
            # trainer's limit_train_batches cutoff each epoch).
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                if getattr(self.dataset, "_native", False):
                    # Native path: one GIL-releasing C call per batch, so
                    # assemble several batches concurrently on the pool (a
                    # sliding window of futures keeps order and bounds
                    # memory).  The numpy path below must stay serial here —
                    # its _collate maps __getitem__ over the same pool, and
                    # submitting it from pool workers would deadlock.
                    from collections import deque

                    futs: deque = deque()
                    inflight = min(self.num_workers, self.prefetch + 2)
                    for batch_idx in list(batches[:inflight]):
                        futs.append(self._pool.submit(self._collate, batch_idx))
                    consumed = inflight
                    while futs:
                        if stop.is_set():
                            return
                        item = futs.popleft().result()
                        if consumed < len(batches):
                            futs.append(
                                self._pool.submit(self._collate, batches[consumed])
                            )
                            consumed += 1
                        if not put_checking_stop(item):
                            return
                    return
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    if not put_checking_stop(self._collate(batch_idx)):
                        return
            finally:
                put_checking_stop(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            # Drain so a producer mid-put unblocks immediately.
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            thread.join(timeout=5.0)
            self._pool.shutdown(wait=False)


def synthetic_batch(
    batch_size: int,
    time_window: int,
    channels: int,
    height: int,
    width: int,
    num_fluid_params: Optional[int] = None,
    seed: int = 0,
):
    """Random (inp, tgt[, fluid_params]) batch for benchmarks and tests."""
    rng = np.random.default_rng(seed)
    shape = (batch_size, time_window, channels, height, width)
    inp = rng.standard_normal(shape, dtype=np.float32)
    tgt = rng.standard_normal(shape, dtype=np.float32)
    if num_fluid_params is None:
        return inp, tgt
    cond = rng.standard_normal((batch_size, num_fluid_params), dtype=np.float32)
    return inp, tgt, cond
