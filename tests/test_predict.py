"""Serving CLI coverage (cli/predict.py — the serving extra the reference
never had; its closest surface is the inference loop of
ref src/generate_projections.py:48-63): reference-format checkpoint loading,
static-batch padding, top-k output, the fusion-model embedding path, and the
missing-embedding error path — predictions asserted against a direct
model.apply oracle on identically preprocessed images."""
import json
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from artgraph_tpu import config

N_STYLE, N_GENRE = 4, 3


@pytest.fixture()
def small_classes(monkeypatch):
    """predict.py builds heads from config.NUM_CLASSES; shrink to the
    fixture's class counts so checkpoints and CLI agree."""
    monkeypatch.setattr(config, "NUM_CLASSES",
                        {"style": N_STYLE, "genre": N_GENRE})


@pytest.fixture()
def image_dir(synthetic_dataset, tmp_path):
    """5 fixture images in a fresh dir: batch 4 forces a padded second chunk."""
    d = tmp_path / "imgs"
    d.mkdir()
    src = synthetic_dataset["image_dir"]
    for name in sorted(os.listdir(src))[:5]:
        shutil.copy(os.path.join(src, name), d / name)
    return str(d)


def _files(image_dir):
    return [os.path.join(image_dir, f) for f in sorted(os.listdir(image_dir))]


def _oracle(model, variables, files, transform_type, *embs):
    """The prediction the CLI must reproduce: same decode/resize/normalize,
    same eval-mode apply, natural (unpadded) batch — eval rows are
    independent, so padding must not change them."""
    from artgraph_tpu.data.transforms import decode_resize_uint8
    from artgraph_tpu.ops.preprocess import normalize_images

    imgs = jnp.asarray(np.stack([decode_resize_uint8(f) for f in files]))
    x = normalize_images(imgs, transform_type)
    return model.apply(variables, x, *embs, train=False)


def test_predict_single_task_csv(small_classes, image_dir, tmp_path):
    from artgraph_tpu import models as m
    from artgraph_tpu.checkpointing import save_reference_checkpoint
    from artgraph_tpu.cli import predict

    model = m.ResnetSingleTask(N_STYLE)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 224, 224, 3), jnp.float32),
                           train=False)
    ck = str(tmp_path / "resnet_single.pt")
    save_reference_checkpoint("ResnetSingleTask", jax.device_get(variables), ck)

    out_csv = str(tmp_path / "preds.csv")
    rc = predict.main([
        "--checkpoint", ck, "--model", "ResnetSingleTask", "--label", "style",
        "--images", image_dir, "--batch", "4", "--top_k", "2",
        "--output", out_csv])
    assert rc == 0

    files = _files(image_dir)
    df = pd.read_csv(out_csv)
    assert list(df.columns) == ["image", "style_top2", "style_pred"]
    assert list(df["image"]) == files

    logits = np.asarray(_oracle(model, variables, files, "resnet"))
    expect_top2 = np.argsort(-logits, axis=1)[:, :2]
    for i in range(len(files)):
        assert json.loads(df["style_top2"][i]) == expect_top2[i].tolist()
        assert df["style_pred"][i] == expect_top2[i, 0]


def test_predict_fusion_multitask_stdout(small_classes, image_dir, tmp_path,
                                         capsys):
    from artgraph_tpu import models as m
    from artgraph_tpu.checkpointing import save_reference_checkpoint
    from artgraph_tpu.cli import predict
    from artgraph_tpu.data.embeddings import save_embedding

    nc = {"style": N_STYLE, "genre": N_GENRE}
    model = m.NewMultiModalMultiTask(config.EMB_SIZE, nc)
    init_args = (jnp.zeros((1, 224, 224, 3), jnp.float32),
                 jnp.zeros((1, config.EMB_SIZE), jnp.float32),
                 jnp.zeros((1, config.EMB_SIZE), jnp.float32))
    variables = model.init(jax.random.PRNGKey(1), *init_args, train=False)
    ck = str(tmp_path / "fusion.pt")
    save_reference_checkpoint("NewMultiModalMultiTask",
                              jax.device_get(variables), ck)

    files = _files(image_dir)
    rng = np.random.default_rng(3)
    emb_s = rng.normal(size=(len(files), config.EMB_SIZE)).astype(np.float32)
    emb_g = rng.normal(size=(len(files), config.EMB_SIZE)).astype(np.float32)
    p_s, p_g = str(tmp_path / "es.pt"), str(tmp_path / "eg.pt")
    save_embedding(p_s, emb_s)
    save_embedding(p_g, emb_g)

    rc = predict.main([
        "--checkpoint", ck, "--model", "NewMultiModalMultiTask",
        "--images", image_dir, "--batch", "4", "--top_k", "1",
        "--emb_style", p_s, "--emb_genre", p_g])
    assert rc == 0
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert [r["image"] for r in rows] == files

    out_s, out_g = _oracle(model, variables, files, "resnet",
                           jnp.asarray(emb_s), jnp.asarray(emb_g))
    expect_s = np.argmax(np.asarray(out_s), axis=1)
    expect_g = np.argmax(np.asarray(out_g), axis=1)
    for i, r in enumerate(rows):
        assert r["style_pred"] == expect_s[i]
        assert r["genre_pred"] == expect_g[i]


def test_predict_fusion_requires_embeddings(small_classes, image_dir, tmp_path):
    from artgraph_tpu import models as m
    from artgraph_tpu.checkpointing import save_reference_checkpoint
    from artgraph_tpu.cli import predict

    nc = {"style": N_STYLE, "genre": N_GENRE}
    model = m.NewMultiModalMultiTask(config.EMB_SIZE, nc)
    variables = model.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, config.EMB_SIZE), jnp.float32),
        jnp.zeros((1, config.EMB_SIZE), jnp.float32), train=False)
    ck = str(tmp_path / "fusion.pt")
    save_reference_checkpoint("NewMultiModalMultiTask",
                              jax.device_get(variables), ck)

    with pytest.raises(SystemExit):
        predict.main(["--checkpoint", ck, "--model", "NewMultiModalMultiTask",
                      "--images", image_dir])
