"""HBM-resident dataset loader: upload once, gather batches on device.

The decoded-uint8 cache (data/cache.py) removes JPEG decode from cached
epochs, but every batch still crosses host->device. On this container the
TPU is reached through a tunnel moving ~19 MB/s, so a 128x224x224x3 uint8
batch costs ~1 s of wire time — 20x the 45 ms compute step. Even on real
PCIe/ICI hardware the transfer is pure overhead when the dataset fits in
HBM (16 GB on v5e; 224px uint8 images are ~150 KB each, so ~100k images
fit alongside ResNet50/ViT-B activations).

ResidentLoader materializes every dataset component ONCE (vectorized
get_batch over all rows — this is also what fills the decoded cache),
ships them to the device a single time, and then serves each batch as a
jitted on-device gather: zero bulk H2D per step, identical batch order,
padding and masks to the host DataLoader (same per-epoch shuffle rng).

The reference has no analog (its DataLoader re-reads JPEGs every epoch,
ref: src/data/data.py:38-49); this is the TPU-native answer to the same
hot loop.
"""
from __future__ import annotations

import numpy as np


class ResidentLoader:
    """Drop-in replacement for data.loader.DataLoader (same iterator
    contract: yields (components..., f32 mask) with static shapes) whose
    batches never leave the device.

    Args match DataLoader; `num_workers` is accepted and ignored (there is
    no host work to parallelize after upload).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 0, seed: int = 1,
                 pad_last: bool = True):
        import jax
        import jax.numpy as jnp

        if not hasattr(dataset, "get_batch"):
            raise TypeError(
                f"{type(dataset).__name__} has no vectorized get_batch(); "
                "ResidentLoader requires one")
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.pad_last = pad_last
        self.n = len(dataset)
        self._epoch = 0

        comps = dataset.get_batch(np.arange(self.n, dtype=np.int64))
        self.nbytes = int(sum(np.asarray(c).nbytes for c in comps))
        self.data = tuple(jax.device_put(np.asarray(c)) for c in comps)

        def gather(data, idx):
            return tuple(a[idx] for a in data)

        self._gather = jax.jit(gather)
        self._jnp = jnp

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        self._epoch += 1
        order = np.arange(self.n)
        if self.shuffle:
            # identical rng scheme to DataLoader._batch_indices so host and
            # resident loaders produce bit-identical epochs
            rng = np.random.default_rng((self.seed, self._epoch))
            rng.shuffle(order)
        stop = self.n - self.n % self.batch_size if self.drop_last else self.n
        B = self.batch_size
        for start in range(0, stop, B):
            idx = order[start:start + B]
            k = len(idx)
            if not self.pad_last:
                # DataLoader's pad_last=False contract: NO mask on any
                # batch (loader.py _finalize) — consistent tuple arity
                batch = self._gather(self.data, self._jnp.asarray(idx))
                yield batch
                continue
            mask = np.zeros(B, np.float32)
            mask[:k] = 1.0
            if k < B:
                idx = np.pad(idx, (0, B - k))  # gather row 0 into pad slots
            batch = self._gather(self.data, self._jnp.asarray(idx))
            yield (*batch, mask)
