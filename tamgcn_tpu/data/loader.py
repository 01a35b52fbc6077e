"""Host-side batch loader: the TPU-native replacement for torch DataLoader.

The reference builds torch DataLoaders with shuffle + drop_last and per-GPU
worker scaling (processor/processor.py:50-70). Here the loader is a plain
numpy pipeline with

  * deterministic per-epoch shuffling (seeded, reproducible resume);
  * thread-pool sample assembly (augmentation releases the GIL in numpy);
  * fixed-shape stacked numpy batches ready for a single host->device put;
  * multi-host sharding: each process takes its contiguous index shard, so a
    global batch is assembled with jax.make_array_from_process_local_data by
    the sharded trainer (SURVEY §2.3 item 1).
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence

import numpy as np


def _collate(samples: Sequence[tuple]) -> tuple:
    cols = list(zip(*samples))
    out = []
    for col in cols:
        first = col[0]
        if isinstance(first, np.ndarray):
            out.append(np.stack(col))
        else:
            out.append(np.asarray(col))
    return tuple(out)


class Loader:
    """Deterministic shuffling batch loader over a map-style dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        num_workers: int = 4,
        process_index: int = 0,
        process_count: int = 1,
    ):
        if process_count > 1 and batch_size % process_count == 0:
            # per-process share of the global batch
            self.local_batch = batch_size // process_count
        else:
            self.local_batch = batch_size
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.Generator(
                np.random.Philox(key=self.seed, counter=[0, 0, self.epoch, 1])
            )
            rng.shuffle(idx)
        if self.process_count > 1:
            # equalise shard sizes by dropping the tail remainder
            per = n // self.process_count
            start = self.process_index * per
            idx = idx[start:start + per]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.local_batch
        return -(-n // self.local_batch)

    def __iter__(self) -> Iterator[tuple]:
        idx = self._indices()
        nb = len(self)
        get_batch = getattr(self.dataset, "get_batch", None)
        with ThreadPoolExecutor(max_workers=max(1, self.num_workers)) as pool:
            for b in range(nb):
                chunk = idx[b * self.local_batch:(b + 1) * self.local_batch]
                if get_batch is not None:
                    batch = get_batch(chunk)
                    if batch is not None:  # native fast path
                        yield batch
                        continue
                samples = list(pool.map(self.dataset.__getitem__, chunk))
                yield _collate(samples)


def prefetch(iterator, put=None, size: int = 2):
    """Pipeline an iterator through a background thread, keeping up to `size`
    items in flight.

    `put` runs in the producer thread — pass the host->device transfer (e.g.
    shard_batch) so the next batch's H2D copy (~4.5 ms for a 64-sample
    NW-UCLA batch through the tunneled TPU) and the feeder's CPU augmentation
    overlap the current training step instead of serialising with it. This is
    the TPU-analog of torch DataLoader worker prefetching
    (reference processor/processor.py:57-70).
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, size))
    done = object()

    def producer():
        try:
            for item in iterator:
                q.put(put(item) if put is not None else item)
            q.put(done)
        except BaseException as e:  # propagate into the consumer
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is done:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
