"""Optional grain-based input pipeline.

The primary loader (:mod:`bubbleformer_tpu.data.pipeline`) is a purpose-built
thread-prefetching loader with a native C batch-assembly fast path.  This
module offers the same data through `grain <https://github.com/google/grain>`_
for users standardized on that stack (deterministic multi-epoch iteration,
worker processes, checkpointable iterators).  Import is guarded — grain is
optional.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from bubbleformer_tpu.data.dataset import BubbleForecast

try:
    import grain.python as grain

    GRAIN_AVAILABLE = True
except ImportError:  # pragma: no cover
    GRAIN_AVAILABLE = False


class _Source:
    """grain RandomAccessDataSource over a BubbleForecast dataset."""

    def __init__(self, dataset: BubbleForecast):
        self._dataset = dataset

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, idx):
        return self._dataset[int(idx)]


def make_grain_loader(
    dataset: BubbleForecast,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    num_epochs: Optional[int] = None,
    worker_count: int = 0,
    process_index: int = 0,
    process_count: int = 1,
):
    """Batched grain DataLoader over the sliding-window dataset.

    Yields the same (inp, tgt[, fluid_params]) numpy tuples as
    :class:`bubbleformer_tpu.data.pipeline.DataLoader`.
    """
    if not GRAIN_AVAILABLE:
        raise ImportError("grain is not installed; use bubbleformer_tpu.data.DataLoader")

    source = _Source(dataset)
    sampler = grain.IndexSampler(
        num_records=len(source),
        shard_options=grain.ShardOptions(
            shard_index=process_index, shard_count=process_count, drop_remainder=True
        ),
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )

    def _batch(samples):
        return tuple(
            np.stack([s[i] for s in samples]) for i in range(len(samples[0]))
        )

    loader = grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=True)],
        worker_count=worker_count,
    )
    return loader
