"""Dataset/loader semantics: manifests, indexing modes, padding, class weights."""
import numpy as np
import pytest

from artgraph_tpu.data import (
    ArtGraphMultiTask,
    ArtGraphSingleTask,
    DataLoader,
    LabelProjectionDataset,
    MultiModalArtgraphSingleTask,
    NewMultiModalArtgraphMultiTask,
    get_class_weights,
    load_dataset,
    prepare_raw_dataset,
)


def test_manifest_columns(synthetic_dataset):
    df = prepare_raw_dataset(synthetic_dataset["dataset_dir"], "train")
    assert list(df.columns) == ["idx", "image", "style", "genre"]
    assert len(df) == synthetic_dataset["counts"]["train"]


def test_single_task_dataset_items(synthetic_dataset):
    train, valid, test = load_dataset(
        synthetic_dataset["dataset_dir"], synthetic_dataset["image_dir"],
        mode="single_task", label="style")
    img, label = train[0]
    assert img.shape == (224, 224, 3) and img.dtype == np.uint8
    assert isinstance(label, int)
    assert len(valid) == synthetic_dataset["counts"]["validation"]


def test_multi_task_dataset_items(synthetic_dataset):
    df = prepare_raw_dataset(synthetic_dataset["dataset_dir"], "train")
    ds = ArtGraphMultiTask(synthetic_dataset["image_dir"],
                           df[["image", "style", "genre"]])
    img, labels = ds[3]
    assert labels == [int(df.iloc[3, 2]), int(df.iloc[3, 3])]


def test_multimodal_embedding_indexing_modes(synthetic_dataset):
    """The three embedding-indexing modes (ref: src/data/data_kg.py:100-106)."""
    df = prepare_raw_dataset(synthetic_dataset["dataset_dir"], "train")
    n = len(df)
    emb_by_row = np.arange(n * 4, dtype=np.float32).reshape(n, 4)
    emb_by_label = np.arange(synthetic_dataset["num_style"] * 4,
                             dtype=np.float32).reshape(-1, 4) * 100

    # train + artwork: row-indexed
    ds = MultiModalArtgraphSingleTask(
        synthetic_dataset["image_dir"], df[["image", "style"]], emb_by_row,
        type="train", emb_type="artwork")
    _, emb, _ = ds[5]
    np.testing.assert_array_equal(emb, emb_by_row[5])

    # train + style: label-indexed
    ds = MultiModalArtgraphSingleTask(
        synthetic_dataset["image_dir"], df[["image", "style"]], emb_by_label,
        type="train", emb_type="style")
    _, emb, label = ds[5]
    np.testing.assert_array_equal(emb, emb_by_label[label])

    # validation: row-indexed (projected) regardless of emb_type
    ds = MultiModalArtgraphSingleTask(
        synthetic_dataset["image_dir"], df[["image", "style"]], emb_by_row,
        type="validation", emb_type="style")
    _, emb, _ = ds[7]
    np.testing.assert_array_equal(emb, emb_by_row[7])


def test_new_multimodal_multitask_items(synthetic_dataset):
    df = prepare_raw_dataset(synthetic_dataset["dataset_dir"], "train")
    n = len(df)
    e_style = np.random.default_rng(0).normal(size=(n, 4)).astype(np.float32)
    e_genre = np.random.default_rng(1).normal(size=(n, 4)).astype(np.float32)
    ds = NewMultiModalArtgraphMultiTask(
        synthetic_dataset["image_dir"], df[["image", "style", "genre"]],
        e_style, e_genre, type="train", emb_type="artwork")
    img, es, eg, labels = ds[2]
    np.testing.assert_array_equal(es, e_style[2])
    np.testing.assert_array_equal(eg, e_genre[2])
    assert len(labels) == 2


def test_label_projection_dataset(synthetic_dataset):
    df = prepare_raw_dataset(synthetic_dataset["dataset_dir"], "train")
    n_style = synthetic_dataset["num_style"]
    emb = np.arange(n_style * 3, dtype=np.float32).reshape(n_style, 3)
    ds = LabelProjectionDataset(
        synthetic_dataset["image_dir"], df[["image", "style", "genre"]],
        emb, emb_type="style")
    _, e = ds[4]
    np.testing.assert_array_equal(e, emb[int(df.iloc[4, 2])])


def test_loader_padding_and_mask(synthetic_dataset):
    train, _, _ = load_dataset(
        synthetic_dataset["dataset_dir"], synthetic_dataset["image_dir"],
        mode="single_task", label="genre")
    loader = DataLoader(train, batch_size=10, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3  # 24 items -> 10+10+4
    images, labels, mask = batches[-1]
    assert images.shape == (10, 224, 224, 3)
    assert labels.shape == (10,)
    np.testing.assert_array_equal(
        mask, np.array([1, 1, 1, 1, 0, 0, 0, 0, 0, 0], np.float32))


def test_loader_shuffle_is_deterministic(synthetic_dataset):
    train, _, _ = load_dataset(
        synthetic_dataset["dataset_dir"], synthetic_dataset["image_dir"],
        mode="single_task", label="genre")
    a = DataLoader(train, batch_size=8, shuffle=True, seed=1, num_workers=1)
    b = DataLoader(train, batch_size=8, shuffle=True, seed=1, num_workers=1)
    la = [batch[1] for batch in a]
    lb = [batch[1] for batch in b]
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(x, y)


def test_class_weights_formula(synthetic_dataset):
    """n/(count*num_classes), ordered by sorted label value
    (ref: src/utils.py:268-274)."""
    train, _, _ = load_dataset(
        synthetic_dataset["dataset_dir"], synthetic_dataset["image_dir"],
        mode="single_task", label="style")
    num_classes = synthetic_dataset["num_style"]
    weights = get_class_weights(train, num_classes, "style")

    df = train.dataset
    counts = df.groupby("style").count()["image"]
    expected = (len(df) / (counts * num_classes)).values.astype(np.float32)
    np.testing.assert_allclose(weights, expected, rtol=1e-6)


def test_decoded_image_cache(synthetic_dataset, tmp_path):
    """First access decodes and fills the cache; later accesses read the
    memmap and bypass decode entirely."""
    from artgraph_tpu.data.cache import wrap_with_cache

    train, _, _ = load_dataset(
        synthetic_dataset["dataset_dir"], synthetic_dataset["image_dir"],
        mode="single_task", label="style")
    img_before, label = train[3]
    train = wrap_with_cache(train, str(tmp_path), "train")

    img_first, _ = train[3]
    np.testing.assert_array_equal(img_first, img_before)
    assert train._decoded_cache.valid[3] == 1

    # poison the decode path: cached reads must not hit it
    def boom(idx):
        raise AssertionError("decode called for cached index")
    inner = train._decoded_cache
    img_cached = inner.get(3, boom)
    np.testing.assert_array_equal(img_cached, img_before)

    # a fresh wrapper over the same cache dir reuses the persisted data
    train2, _, _ = load_dataset(
        synthetic_dataset["dataset_dir"], synthetic_dataset["image_dir"],
        mode="single_task", label="style")
    train2 = wrap_with_cache(train2, str(tmp_path), "train")
    assert train2._decoded_cache.valid[3] == 1


def test_get_batch_matches_per_item_collate(synthetic_dataset):
    """Vectorized get_batch must be bit-identical to per-item __getitem__
    collation for every dataset class (the loader fast path)."""
    from artgraph_tpu.data.datasets import (
        MultiModalArtgraphMultiTask, Subset)
    from artgraph_tpu.data.loader import _collate

    df = prepare_raw_dataset(synthetic_dataset["dataset_dir"], "train")
    img_dir = synthetic_dataset["image_dir"]
    n = len(df)
    rng = np.random.default_rng(2)
    emb = rng.normal(size=(n, 4)).astype(np.float32)
    emb_lbl = rng.normal(size=(max(synthetic_dataset["num_style"],
                                   synthetic_dataset["num_genre"]), 4)
                         ).astype(np.float32)

    datasets = [
        ArtGraphSingleTask(img_dir, df[["image", "style"]]),
        ArtGraphMultiTask(img_dir, df[["image", "style", "genre"]]),
        MultiModalArtgraphSingleTask(img_dir, df[["image", "style"]], emb,
                                     type="train", emb_type="artwork"),
        MultiModalArtgraphSingleTask(img_dir, df[["image", "style"]], emb_lbl,
                                     type="train", emb_type="style"),
        MultiModalArtgraphMultiTask(img_dir, df[["image", "style", "genre"]],
                                    emb),
        LabelProjectionDataset(img_dir, df[["image", "style", "genre"]],
                               emb_lbl, emb_type="style"),
        NewMultiModalArtgraphMultiTask(
            img_dir, df[["image", "style", "genre"]], emb_lbl, emb_lbl,
            type="train", emb_type="style"),
        NewMultiModalArtgraphMultiTask(
            img_dir, df[["image", "style", "genre"]], emb, emb,
            type="validation", emb_type="artwork"),
        Subset(ArtGraphSingleTask(img_dir, df[["image", "style"]]),
               [5, 1, 9, 3, 7, 0]),
    ]
    for ds in datasets:
        indices = [3, 0, 5, 2]
        fast = ds.get_batch(indices)
        slow = _collate([ds[i] for i in indices])
        assert len(fast) == len(slow), type(ds).__name__
        for f, s in zip(fast, slow):
            f, s = np.asarray(f), np.asarray(s)
            assert f.dtype == s.dtype, type(ds).__name__
            np.testing.assert_array_equal(f, s, err_msg=type(ds).__name__)


def test_get_batch_uses_cache_gather(synthetic_dataset, tmp_path):
    """With a complete decoded cache, get_batch slices the mmap directly."""
    from artgraph_tpu.data.cache import wrap_with_cache

    train, _, _ = load_dataset(
        synthetic_dataset["dataset_dir"], synthetic_dataset["image_dir"],
        mode="single_task", label="style")
    wrap_with_cache(train, str(tmp_path), "train")
    per_item = np.stack([train[i][0] for i in range(len(train))])  # fills
    assert train._decoded_cache.complete
    imgs, labels = train.get_batch([4, 2, 0])
    np.testing.assert_array_equal(imgs, per_item[[4, 2, 0]])


def test_resident_loader_matches_host_loader(synthetic_dataset, tmp_path):
    """ResidentLoader (HBM-resident, on-device gather) must yield epochs
    bit-identical to the host DataLoader: same shuffle order, same padding,
    same mask."""
    from artgraph_tpu.data import ResidentLoader

    train, _, _ = load_dataset(
        synthetic_dataset["dataset_dir"], synthetic_dataset["image_dir"],
        mode="single_task", label="style")
    host = DataLoader(train, batch_size=10, shuffle=True, num_workers=2,
                      seed=3)
    res = ResidentLoader(train, batch_size=10, shuffle=True, seed=3)
    assert len(host) == len(res)
    for _ in range(2):  # epochs advance the shuffle rng identically
        for hb, rb in zip(host, res):
            assert len(hb) == len(rb)
            for h, r in zip(hb, rb):
                h, r = np.asarray(h), np.asarray(r)
                assert h.dtype == r.dtype or (h.dtype == np.float32
                                              and r.dtype == np.float32)
                # padded rows of the resident loader gather row 0 instead of
                # zeros; compare valid rows only, masks exactly
                mask = np.asarray(hb[-1])
                k = int(mask.sum())
                np.testing.assert_array_equal(h[:k], r[:k])
            np.testing.assert_array_equal(np.asarray(hb[-1]),
                                          np.asarray(rb[-1]))


def test_resident_device_iter_matches_host_loader(synthetic_dataset):
    """device_iter (the Trainer fast path: one index+mask upload per epoch)
    must produce the same (n_valid, batch_size, batch) stream the trainer's
    host-loader producer would: identical shuffle order, masks, and valid
    counts — and advance the epoch rng in lockstep with __iter__."""
    from artgraph_tpu.data import ResidentLoader

    train, _, _ = load_dataset(
        synthetic_dataset["dataset_dir"], synthetic_dataset["image_dir"],
        mode="single_task", label="style")
    host = DataLoader(train, batch_size=10, shuffle=True, num_workers=0,
                      seed=3)
    res = ResidentLoader(train, batch_size=10, shuffle=True, seed=3)
    for _ in range(2):  # epoch rng must advance identically
        stream = list(res.device_iter())
        assert len(stream) == len(host)
        for hb, (n, bsize, rb) in zip(host, stream):
            hmask = np.asarray(hb[-1])
            assert bsize == hmask.shape[0]
            assert n == float(hmask.sum())
            np.testing.assert_array_equal(hmask, np.asarray(rb[-1]))
            k = int(n)
            for h, r in zip(hb[:-1], rb[:-1]):
                np.testing.assert_array_equal(
                    np.asarray(h)[:k], np.asarray(r)[:k])
