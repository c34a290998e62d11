"""Decoded-image cache: FFCV-style epoch acceleration.

The reference re-decodes and re-resizes every JPEG every epoch inside
DataLoader workers (ref: src/data/data.py:38-49) — at ~16 ms/image that is
the true bottleneck of every epoch after the first. This cache memory-maps a
[N, size, size, 3] uint8 file per split; the first epoch fills it (decode
happens once), later epochs read at memory bandwidth. A parallel validity
byte-map makes partially-built caches safe to resume.

Usage: wrap any artgraph_tpu dataset (all of them route image loading
through `_image(idx)`):

    dataset = wrap_with_cache(dataset, cache_dir, "train")
"""
from __future__ import annotations

import os
import types

import numpy as np

from artgraph_tpu import config


class DecodedImageCache:
    def __init__(self, cache_dir: str, name: str, n: int,
                 size: int = config.IMAGE_SIZE):
        os.makedirs(cache_dir, exist_ok=True)
        self.data_path = os.path.join(cache_dir, f"{name}_{size}.u8")
        self.valid_path = os.path.join(cache_dir, f"{name}_{size}.valid")
        mode = "r+" if os.path.exists(self.data_path) else "w+"
        self.data = np.memmap(self.data_path, dtype=np.uint8, mode=mode,
                              shape=(n, size, size, 3))
        vmode = "r+" if os.path.exists(self.valid_path) else "w+"
        self.valid = np.memmap(self.valid_path, dtype=np.uint8, mode=vmode,
                               shape=(n,))

    def get(self, idx: int, decode_fn):
        if not self.valid[idx]:
            image = decode_fn(idx)
            self.data[idx] = image
            self.valid[idx] = 1
            return image
        return np.asarray(self.data[idx])

    @property
    def complete(self) -> bool:
        return bool(self.valid.all())


def wrap_with_cache(dataset, cache_dir: str, name: str):
    """Route a dataset's `_image(idx)` through a persistent decoded cache.

    Works for every dataset class in artgraph_tpu.data.datasets (they all
    fetch pixels via `_image`). Returns the same dataset object, modified
    in place.
    """
    cache = DecodedImageCache(cache_dir, name, len(dataset))
    original = dataset._image

    def cached_image(self, idx: int):
        return cache.get(idx, original)

    dataset._image = types.MethodType(cached_image, dataset)
    dataset._decoded_cache = cache
    return dataset
