"""Dataset factories and class-weight computation.

One-to-one re-creation of the reference's factory family
(ref: src/utils.py:51-223) including the seeded 80/10/10 projector split
(random_state=11) and the train-true / eval-projected embedding switching.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np
from sklearn.model_selection import train_test_split

from artgraph_tpu import config
from artgraph_tpu.data.datasets import (
    ArtGraphMultiTask,
    ArtGraphSingleTask,
    LabelProjectionDataset,
    MultiModalArtgraphMultiTask,
    MultiModalArtgraphSingleTask,
    NewMultiModalArtgraphMultiTask,
    Subset,
)
from artgraph_tpu.data.embeddings import load_embedding
from artgraph_tpu.data.manifest import prepare_raw_dataset


def load_dataset(base_dir: str, image_dir: str, mode: str, label: str = None,
                 transform_type: str = "resnet"):
    """Image-only datasets for train/valid/test (ref: src/utils.py:51-81)."""
    assert mode in ["single_task", "multi_task"]
    assert transform_type in ["resnet", "vit"]

    raw_train = prepare_raw_dataset(base_dir, type="train")
    raw_valid = prepare_raw_dataset(base_dir, type="validation")
    raw_test = prepare_raw_dataset(base_dir, type="test")

    if mode == "single_task":
        return (
            ArtGraphSingleTask(image_dir, raw_train[["image", label]], transform_type),
            ArtGraphSingleTask(image_dir, raw_valid[["image", label]], transform_type),
            ArtGraphSingleTask(image_dir, raw_test[["image", label]], transform_type),
        )
    cols = ["image", "style", "genre"]
    return (
        ArtGraphMultiTask(image_dir, raw_train[cols], transform_type),
        ArtGraphMultiTask(image_dir, raw_valid[cols], transform_type),
        ArtGraphMultiTask(image_dir, raw_test[cols], transform_type),
    )


def load_dataset_multimodal(base_dir: str, image_dir: str, mode: str,
                            label: str = None, emb_type: str = None,
                            emb_train: str = None):
    """Contextual (ContextNet/MultiModal) datasets (ref: src/utils.py:83-118).

    Train uses (image, embedding, label); valid/test are image-only since the
    logits path needs no embedding at eval.
    """
    assert mode in ["single_task", "multi_task"]
    assert emb_type in ["artwork", "genre", "style"]

    raw_train = prepare_raw_dataset(base_dir, type="train")
    raw_valid = prepare_raw_dataset(base_dir, type="validation")
    raw_test = prepare_raw_dataset(base_dir, type="test")

    embeddings = load_embedding(os.path.join(base_dir, "train", "embeddings", emb_train))

    if mode == "single_task":
        assert label in ["genre", "style"]
        return (
            MultiModalArtgraphSingleTask(
                image_dir, raw_train[["image", label]], embeddings, emb_type=emb_type),
            ArtGraphSingleTask(image_dir, raw_valid[["image", label]]),
            ArtGraphSingleTask(image_dir, raw_test[["image", label]]),
        )
    cols = ["image", "style", "genre"]
    return (
        MultiModalArtgraphMultiTask(image_dir, raw_train[cols], embeddings),
        ArtGraphMultiTask(image_dir, raw_valid[cols]),
        ArtGraphMultiTask(image_dir, raw_test[cols]),
    )


def load_dataset_new_multimodal(base_dir: str, image_dir: str, label: str,
                                emb_type: str, emb_train: str, emb_valid: str,
                                emb_test: str):
    """Single-task new-multimodal datasets (ref: src/utils.py:120-153).

    Train gets TRUE embeddings; valid/test get PROJECTED ones.
    """
    raw_train = prepare_raw_dataset(base_dir, type="train")
    raw_valid = prepare_raw_dataset(base_dir, type="validation")
    raw_test = prepare_raw_dataset(base_dir, type="test")

    embeddings_train = load_embedding(os.path.join(base_dir, "train", "embeddings", emb_train))
    embeddings_valid = load_embedding(os.path.join(base_dir, "validation", "embeddings", emb_valid))
    embeddings_test = load_embedding(os.path.join(base_dir, "test", "embeddings", emb_test))

    return (
        MultiModalArtgraphSingleTask(image_dir, raw_train[["image", label]],
                                     embeddings_train, type="train", emb_type=emb_type),
        MultiModalArtgraphSingleTask(image_dir, raw_valid[["image", label]],
                                     embeddings_valid, type="validation", emb_type=emb_type),
        MultiModalArtgraphSingleTask(image_dir, raw_test[["image", label]],
                                     embeddings_test, type="test", emb_type=emb_type),
    )


def load_dataset_multitask_new_multimodal(base_dir: str, image_dir: str,
                                          emb_type: str,
                                          emb_train: Dict[str, str],
                                          emb_valid: Dict[str, str],
                                          emb_test: Dict[str, str],
                                          transform_type: str = "resnet"):
    """Multi-task new-multimodal datasets (ref: src/utils.py:155-192)."""
    raw_train = prepare_raw_dataset(base_dir, type="train")
    raw_valid = prepare_raw_dataset(base_dir, type="validation")
    raw_test = prepare_raw_dataset(base_dir, type="test")

    def _load(split: str, names: Dict[str, str]):
        return {
            task: load_embedding(os.path.join(base_dir, split, "embeddings", names[task]))
            for task in ("style", "genre")
        }

    e_train = _load("train", emb_train)
    e_valid = _load("validation", emb_valid)
    e_test = _load("test", emb_test)

    cols = ["image", "style", "genre"]
    return (
        NewMultiModalArtgraphMultiTask(image_dir, raw_train[cols], e_train["style"],
                                       e_train["genre"], "train", emb_type, transform_type),
        NewMultiModalArtgraphMultiTask(image_dir, raw_valid[cols], e_valid["style"],
                                       e_valid["genre"], "valid", emb_type, transform_type),
        NewMultiModalArtgraphMultiTask(image_dir, raw_test[cols], e_test["style"],
                                       e_test["genre"], "test", emb_type, transform_type),
    )


def load_dataset_projection(base_dir: str, image_dir: str, node_embedding: str,
                            emb_type: str):
    """Projector train/valid/test as a seeded 80/10/10 split of the TRAIN set
    (ref: src/utils.py:194-223; random_state=11 at :215,:219 — preserved, it
    defines the published projector checkpoints).
    """
    raw = prepare_raw_dataset(base_dir, type="train")
    embeddings = load_embedding(os.path.join(config.EMBEDDINGS_DIR, node_embedding))

    dataset = LabelProjectionDataset(image_dir, raw[["image", "style", "genre"]],
                                     embeddings, emb_type)

    train_idx, drop_idx = train_test_split(
        list(range(len(dataset))), test_size=0.2,
        random_state=config.PROJECTION_SPLIT_SEED)
    dataset_train = Subset(dataset, train_idx)
    dataset_drop = Subset(dataset, drop_idx)

    valid_idx, test_idx = train_test_split(
        list(range(len(dataset_drop))), test_size=0.5,
        random_state=config.PROJECTION_SPLIT_SEED)
    dataset_valid = Subset(dataset_drop, valid_idx)
    dataset_test = Subset(dataset_drop, test_idx)

    return dataset_train, dataset_valid, dataset_test


def get_class_weights(dataset_train, num_classes: int, label: str) -> np.ndarray:
    """Balanced class weights n/(count*num_classes) (ref: src/utils.py:268-274).

    Weight order follows sorted label values (pandas groupby order), exactly
    as the reference feeds torch CrossEntropyLoss.
    """
    dataset = dataset_train.dataset
    n_artworks = dataset.groupby(label).count().image.sum()
    class_distribution = dataset.groupby(label).count()
    weights = class_distribution["image"].map(
        lambda x: n_artworks / (x * num_classes))
    return np.asarray(weights.tolist(), dtype=np.float32)
