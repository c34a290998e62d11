"""Host-side batch loader + device prefetch.

Replaces the reference's torch DataLoader usage (num_workers=6, pin_memory,
shuffle, drop_last=False — ref: src/utils.py:225-236, train_baseline.py:23-25)
with a TPU-native pipeline:

  * a thread pool decodes/collates batches ahead of consumption (JPEG decode
    and PIL resize release the GIL);
  * every batch has a STATIC shape: the final ragged batch is padded to
    batch_size and an explicit f32 validity mask is appended, so the jitted
    train step never recompiles (XLA static-shape requirement);
  * device placement/prefetch is the Trainer's job (`Trainer._prefetched`
    overlaps H2D with compute one batch ahead).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Tuple

import numpy as np


def _collate(items) -> Tuple[np.ndarray, ...]:
    """Stack dataset items into batch arrays.

    Tuple components map to stacked arrays; list components (the reference's
    [style, genre] label pairs) become int32 [B, 2] arrays.
    """
    first = items[0]
    out = []
    for pos in range(len(first)):
        comps = [item[pos] for item in items]
        if isinstance(first[pos], (list, tuple)):
            out.append(np.asarray(comps, dtype=np.int32))
        elif isinstance(first[pos], (int, np.integer)):
            out.append(np.asarray(comps, dtype=np.int32))
        else:
            out.append(np.stack(comps))
    return tuple(out)


def _pad_batch(batch: Tuple[np.ndarray, ...], batch_size: int):
    """Pad every component to `batch_size` rows; return (padded, mask)."""
    n = batch[0].shape[0]
    mask = np.zeros((batch_size,), dtype=np.float32)
    mask[:n] = 1.0
    if n == batch_size:
        return batch, mask
    padded = []
    for comp in batch:
        pad_width = [(0, batch_size - n)] + [(0, 0)] * (comp.ndim - 1)
        padded.append(np.pad(comp, pad_width))
    return tuple(padded), mask


class DataLoader:
    """Iterable over (batch_components..., mask) tuples with static shapes.

    Args mirror the reference loader kwargs (batch_size, shuffle, drop_last,
    num_workers); `seed` drives a per-epoch deterministic shuffle
    (reference determinism comes from torch.manual_seed(1),
    ref: train_baseline.py:10).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 6, seed: int = 1,
                 pad_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.pad_last = pad_last
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self._epoch))
            rng.shuffle(order)
        stop = n - n % self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            yield order[start:start + self.batch_size]

    def __iter__(self) -> Iterator[Tuple[np.ndarray, ...]]:
        self._epoch += 1
        executor = ThreadPoolExecutor(max_workers=self.num_workers)
        get_batch = getattr(self.dataset, "get_batch", None)

        def fetch(indices):
            if get_batch is not None:
                # vectorized assembly: one fancy-index gather per component
                # (decoded-cache mmap slice for images) instead of a Python
                # __getitem__ + pandas .iloc round-trip per item
                return tuple(np.asarray(c) for c in get_batch(indices))
            return _collate([self.dataset[int(i)] for i in indices])

        try:
            # Keep a window of in-flight batch futures for pipelining.
            window = self.num_workers + 2
            pending = []
            index_iter = self._batch_indices()
            for indices in index_iter:
                pending.append(executor.submit(fetch, indices))
                if len(pending) >= window:
                    yield self._finalize(pending.pop(0).result())
            for fut in pending:
                yield self._finalize(fut.result())
        finally:
            # cancel queued decodes too: an abandoned iterator (e.g. a
            # peek-one-batch init) must not leave workers competing with the
            # real epoch on this 1-core host
            executor.shutdown(wait=False, cancel_futures=True)

    def _finalize(self, batch):
        if not self.pad_last:
            return batch
        padded, mask = _pad_batch(batch, self.batch_size)
        return (*padded, mask)


def prepare_dataloader(datasets: Dict[str, object], batch_size: int,
                       **kwargs) -> Dict[str, DataLoader]:
    """Triple-builder matching ref src/utils.py:225-236.

    Accepts and maps the reference's torch kwargs: num_workers and shuffle
    pass through; pin_memory is meaningless on this path (device prefetch
    covers it) and is dropped.
    """
    kwargs.pop("pin_memory", None)
    shuffle = kwargs.pop("shuffle", False)
    drop_last = kwargs.pop("drop_last", False)
    num_workers = kwargs.pop("num_workers", 6)
    loaders = {
        name: DataLoader(ds, batch_size=batch_size, shuffle=shuffle,
                         drop_last=drop_last, num_workers=num_workers, **kwargs)
        for name, ds in datasets.items()
    }
    return loaders


def pipeline(iterator, size: int = 2):
    """Run `iterator` in a background thread, `size` items ahead.

    Generic producer/consumer decoupling: whatever work the iterator does per
    item (batch assembly, device_put) overlaps with the consumer's compute.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err = []

    def producer():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # surfaced in consumer
            err.append(e)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
