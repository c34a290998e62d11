"""Raw-manifest assembly: CSV files -> pandas dataframe.

Reproduces the reference's dataframe semantics exactly
(ref: src/utils.py:30-49 prepare_raw_dataset): the manifest joins
  mapping/artwork_entidx2name.csv            -> columns [idx, image]
  raw/node-label/artwork/node-label-style.csv -> column  [style]
  raw/node-label/artwork/node-label-genre.csv -> column  [genre]
by row position (positional concat, not a key join).
"""
from __future__ import annotations

import os

import pandas as pd


def prepare_raw_dataset(base_dir: str, type: str) -> pd.DataFrame:
    """Assemble the per-split manifest dataframe.

    Args:
        base_dir: dataset root containing the split subdirectories.
        type: one of {"train", "validation", "test"} (and the GNN's
            "train_train"/"train_validation"/"train_test" sub-splits).

    Returns:
        Dataframe with columns [idx, image, style, genre].
    """
    artwork = pd.read_csv(
        os.path.join(base_dir, type, "mapping/artwork_entidx2name.csv"),
        names=["idx", "image"],
    )
    style = pd.read_csv(
        os.path.join(base_dir, type, "raw/node-label/artwork/node-label-style.csv"),
        names=["style"],
    )
    genre = pd.read_csv(
        os.path.join(base_dir, type, "raw/node-label/artwork/node-label-genre.csv"),
        names=["genre"],
    )
    return pd.concat([artwork, style, genre], axis=1)
