"""Map-style datasets over the ArtGraph manifests.

Re-creates every dataset class of the reference with identical item semantics
(same tuple ordering, same embedding-indexing modes), but emits numpy arrays
in TPU-native NHWC uint8 layout; normalization happens on device (see
artgraph_tpu.data.transforms).

Reference classes reproduced:
  ArtGraphSingleTask / ArtGraphMultiTask          (ref: src/data/data.py:53-102)
  MultiModalArtgraphSingleTask / MultiTask        (ref: src/data/data_kg.py:58-108)
  LabelProjectionDataset                          (ref: src/data/data_kg.py:110-129)
  NewMultiModalArtgraphMultiTask                  (ref: src/data/data_kg.py:131-180)
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from artgraph_tpu.data.transforms import decode_resize_uint8

import os


class _ImageDataset:
    """Shared base: image decode from a manifest dataframe.

    The dataframe column order is significant, exactly as in the reference
    (iloc-positional access, ref: src/data/data.py:72-77).
    """

    def __init__(self, image_dir: str, df_image_label: pd.DataFrame,
                 transform_type: str = "resnet"):
        assert transform_type in ("resnet", "vit")
        self.image_dir = image_dir
        self.dataset = df_image_label
        self.transform_type = transform_type

    def __len__(self) -> int:
        return len(self.dataset)

    def prepare_image(self, image_path: str) -> np.ndarray:
        return decode_resize_uint8(image_path)

    def _image(self, idx: int) -> np.ndarray:
        path = os.path.join(self.image_dir, self.dataset.iloc[idx, 0])
        return self.prepare_image(path)

    # -- vectorized batch assembly -------------------------------------
    # Per-item __getitem__ costs ~100us of pandas .iloc + Python per image;
    # at batch 128 that alone caps the epoch rate far below the device step
    # rate. get_batch() gathers a whole batch with numpy fancy indexing —
    # one mmap slice from the decoded cache plus vectorized label lookup.

    def _images_batch(self, idx: np.ndarray) -> np.ndarray:
        cache = getattr(self, "_decoded_cache", None)
        if cache is not None and cache.valid[idx].all():
            return cache.data[idx]  # single vectorized gather (copy)
        return np.stack([self._image(int(i)) for i in idx])

    def _col_i32(self, col: int) -> np.ndarray:
        cols = getattr(self, "_col_arrays", None)
        if cols is None:
            cols = self._col_arrays = {}
        arr = cols.get(col)
        if arr is None:
            arr = cols[col] = self.dataset.iloc[:, col].to_numpy(np.int32)
        return arr


class ArtGraphSingleTask(_ImageDataset):
    """(image, label) items (ref: src/data/data.py:81-102).

    df columns: ['image', <label>] — order significant.
    """

    def __init__(self, image_dir: str, df_image_label: pd.DataFrame,
                 transform_type: str = "resnet"):
        assert "image" in df_image_label.columns
        super().__init__(image_dir, df_image_label, transform_type)

    def __getitem__(self, idx: int):
        image = self._image(idx)
        label_id = int(self.dataset.iloc[idx, 1])
        return image, label_id

    def get_batch(self, indices):
        idx = np.asarray(indices, dtype=np.int64)
        return self._images_batch(idx), self._col_i32(1)[idx]


class ArtGraphMultiTask(_ImageDataset):
    """(image, [style, genre]) items (ref: src/data/data.py:53-78).

    df columns: ['image', 'style', 'genre'] — order significant.
    """

    def __init__(self, image_dir: str, df_image_label: pd.DataFrame,
                 transform_type: str = "resnet"):
        columns = df_image_label.columns
        assert "image" in columns and "style" in columns and "genre" in columns
        super().__init__(image_dir, df_image_label, transform_type)

    def __getitem__(self, idx: int):
        image = self._image(idx)
        style_id = int(self.dataset.iloc[idx, 1])
        genre_id = int(self.dataset.iloc[idx, 2])
        return image, [style_id, genre_id]

    def get_batch(self, indices):
        idx = np.asarray(indices, dtype=np.int64)
        labels = np.stack((self._col_i32(1)[idx], self._col_i32(2)[idx]),
                          axis=1)
        return self._images_batch(idx), labels


class MultiModalArtgraphSingleTask(_ImageDataset):
    """(image, embedding, label) items with three embedding-indexing modes
    (ref: src/data/data_kg.py:82-108):

      * type=='train' and emb_type=='artwork'  -> embeddings[row idx]
      * type=='train' and emb_type!='artwork'  -> embeddings[label id]
      * type!='train' (valid/test, projected)  -> embeddings[row idx]
    """

    def __init__(self, image_dir: str, df_image_label: pd.DataFrame,
                 embeddings: np.ndarray, type: str = "train",
                 emb_type: str = "artwork", transform_type: str = "resnet"):
        assert "image" in df_image_label.columns
        super().__init__(image_dir, df_image_label, transform_type)
        self.embeddings = np.asarray(embeddings, dtype=np.float32)
        self.type = type
        self.emb_type = emb_type

    def __getitem__(self, idx: int):
        image = self._image(idx)
        label_id = int(self.dataset.iloc[idx, 1])
        if self.type == "train" and self.emb_type != "artwork":
            embedding = self.embeddings[label_id]
        else:
            embedding = self.embeddings[idx]
        return image, embedding, label_id

    def get_batch(self, indices):
        idx = np.asarray(indices, dtype=np.int64)
        labels = self._col_i32(1)[idx]
        if self.type == "train" and self.emb_type != "artwork":
            emb = self.embeddings[labels]
        else:
            emb = self.embeddings[idx]
        return self._images_batch(idx), emb, labels


class MultiModalArtgraphMultiTask(_ImageDataset):
    """(image, embedding, [style, genre]) items
    (ref: src/data/data_kg.py:58-79); embeddings indexed by row, with the
    row-alignment assertion preserved.
    """

    def __init__(self, image_dir: str, df_image_label: pd.DataFrame,
                 embeddings: np.ndarray, transform_type: str = "resnet"):
        columns = df_image_label.columns
        assert "image" in columns and "style" in columns and "genre" in columns
        embeddings = np.asarray(embeddings, dtype=np.float32)
        assert len(df_image_label) == embeddings.shape[0]
        super().__init__(image_dir, df_image_label, transform_type)
        self.embeddings = embeddings

    def __getitem__(self, idx: int):
        image = self._image(idx)
        style_id = int(self.dataset.iloc[idx, 1])
        genre_id = int(self.dataset.iloc[idx, 2])
        return image, self.embeddings[idx], [style_id, genre_id]

    def get_batch(self, indices):
        idx = np.asarray(indices, dtype=np.int64)
        labels = np.stack((self._col_i32(1)[idx], self._col_i32(2)[idx]),
                          axis=1)
        return self._images_batch(idx), self.embeddings[idx], labels


class LabelProjectionDataset(_ImageDataset):
    """(image, embedding) regression pairs for the projector
    (ref: src/data/data_kg.py:110-129). df columns: ['image','style','genre'];
    emb_type=='artwork' indexes by row, otherwise by the label in column 1.
    """

    def __init__(self, image_dir: str, df_image_label: pd.DataFrame,
                 embeddings: np.ndarray, emb_type: str,
                 transform_type: str = "resnet"):
        super().__init__(image_dir, df_image_label, transform_type)
        self.embeddings = np.asarray(embeddings, dtype=np.float32)
        self.emb_type = emb_type

    def __getitem__(self, idx: int):
        image = self._image(idx)
        label_id = int(self.dataset.iloc[idx, 1])
        if self.emb_type == "artwork":
            emb = self.embeddings[idx]
        else:
            emb = self.embeddings[label_id]
        return image, emb

    def get_batch(self, indices):
        idx = np.asarray(indices, dtype=np.int64)
        if self.emb_type == "artwork":
            emb = self.embeddings[idx]
        else:
            emb = self.embeddings[self._col_i32(1)[idx]]
        return self._images_batch(idx), emb


class NewMultiModalArtgraphMultiTask(_ImageDataset):
    """(image, emb_style, emb_genre, [style, genre]) items
    (ref: src/data/data_kg.py:131-180). Training mode feeds TRUE KG embeddings
    (by row for emb_type=='artwork', else by label id per task); valid/test
    feed PROJECTED embeddings indexed by row — the train-true/eval-projected
    switch that makes the model deployable on unseen images.
    """

    def __init__(self, image_dir: str, df_image_label: pd.DataFrame,
                 embedding_style: np.ndarray, embedding_genre: np.ndarray,
                 type: str = "train", emb_type: str = "artwork",
                 transform_type: str = "resnet"):
        columns = df_image_label.columns
        assert "image" in columns and "style" in columns and "genre" in columns
        super().__init__(image_dir, df_image_label, transform_type)
        self.embedding_style = np.asarray(embedding_style, dtype=np.float32)
        self.embedding_genre = np.asarray(embedding_genre, dtype=np.float32)
        self.type = type
        self.emb_type = emb_type

    def __getitem__(self, idx: int):
        image = self._image(idx)
        style_id = int(self.dataset.iloc[idx, 1])
        genre_id = int(self.dataset.iloc[idx, 2])
        if self.type == "train":
            if self.emb_type == "artwork":
                embedding_style = self.embedding_style[idx]
                embedding_genre = self.embedding_genre[idx]
            else:
                embedding_style = self.embedding_style[style_id]
                embedding_genre = self.embedding_genre[genre_id]
        else:
            embedding_style = self.embedding_style[idx]
            embedding_genre = self.embedding_genre[idx]
        return image, embedding_style, embedding_genre, [style_id, genre_id]

    def get_batch(self, indices):
        idx = np.asarray(indices, dtype=np.int64)
        styles, genres = self._col_i32(1)[idx], self._col_i32(2)[idx]
        if self.type == "train":
            if self.emb_type == "artwork":
                emb_s, emb_g = self.embedding_style[idx], self.embedding_genre[idx]
            else:
                emb_s = self.embedding_style[styles]
                emb_g = self.embedding_genre[genres]
        else:
            emb_s, emb_g = self.embedding_style[idx], self.embedding_genre[idx]
        return (self._images_batch(idx), emb_s, emb_g,
                np.stack((styles, genres), axis=1))


class Subset:
    """Index-remapped view over a dataset (torch.utils.data.Subset analog,
    used by the seeded projector split, ref: src/utils.py:215-221)."""

    def __init__(self, dataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, idx: int):
        return self.dataset[self.indices[idx]]

    def get_batch(self, indices):
        base = np.asarray(self.indices, dtype=np.int64)[
            np.asarray(indices, dtype=np.int64)]
        return self.dataset.get_batch(base)

    @property
    def transform_type(self) -> str:
        return self.dataset.transform_type
