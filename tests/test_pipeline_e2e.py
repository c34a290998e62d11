"""End-to-end mini-pipeline on synthetic data (SURVEY.md §4 plan): all four
stages — GNN embeddings -> projector -> projections -> fusion model — plus
the baseline trainer, through the real CLI entry points on the 8-device CPU
platform.

The fixture images are class-structured (conftest), so every trainer test
asserts LEARNING — the per-epoch train loss printed by the CLI (the
reference's per-epoch printout, ref src/train_baseline.py:139-140) must
decrease from the first epoch to the last — AND above-chance TEST accuracy
from the RELOADED best checkpoint (the value the CLI returns, computed after
reload_state — ref src/train_baseline.py:102-128), which a corrupted
checkpoint-reload or broken eval path fails where a falling train loss
cannot.

Config note: batch 4 x 6 epochs (36 steps), not the old 8 x 3. Measured on
this fixture: features are learned within 1 epoch (batch-stats test acc
0.875) but EVAL-mode accuracy needs ~36 steps because the BN running stats
are an EMA (momentum 0.9 — reference semantics, torch momentum 0.1) that is
still ~0.15 from converged at 18 steps; at 36 steps measured test acc is
0.75 on both labels vs chance 0.25/0.33."""
import os
import re
import sys

import numpy as np
import pytest


def _train_losses(capsys) -> list:
    """Parse the CLI's per-epoch 'Train loss: <x>' printout."""
    out = capsys.readouterr().out
    sys.stdout.write(out)  # keep -s debuggability
    return [float(m) for m in re.findall(r"Train loss: ([0-9.eE+-]+)", out)]


def _assert_learning(losses, epochs):
    assert len(losses) == epochs, f"expected {epochs} epochs, got {losses}"
    assert losses[-1] < losses[0] * 0.98, (
        f"train loss did not decrease across epochs: {losses}")


# Above-chance floors for the RELOADED-best-checkpoint test accuracy the CLIs
# return: chance is 0.25 (style, 4-class) / 0.33 (genre, 3-class); measured
# 0.625-0.75 at this config. 0.5 leaves one-to-two images (the test split is
# 8 images, accuracy granularity 0.125) of slack below the measured values
# while sitting 1.5-2x above chance.
ACC_FLOOR = 0.5


def _assert_above_chance(acc, label):
    assert acc >= ACC_FLOOR, (
        f"{label} test accuracy {acc} not above chance with margin "
        f"(floor {ACC_FLOOR}): eval path or best-checkpoint reload is "
        f"broken (the accuracy the CLI returns is computed AFTER "
        f"reload_state)")


@pytest.fixture()
def env(synthetic_dataset, synthetic_graph, tmp_path, monkeypatch):
    """Point config at the synthetic trees via env + module reload."""
    ck = tmp_path / "checkpoints"
    proj = tmp_path / "proj"
    emb = os.path.join(synthetic_dataset["dataset_dir"], "train", "embeddings")
    ck.mkdir()
    proj.mkdir()
    os.makedirs(emb, exist_ok=True)
    from artgraph_tpu import config
    monkeypatch.setattr(config, "CHECKPOINTS_DIR", str(ck))
    monkeypatch.setattr(config, "PROJECTIONS_DIR", str(proj))
    monkeypatch.setattr(config, "EMBEDDINGS_DIR", emb)
    monkeypatch.setattr(config, "DATASET_DIR", synthetic_dataset["dataset_dir"])
    monkeypatch.setattr(config, "IMAGE_DIR", synthetic_dataset["image_dir"])
    return {"ck": str(ck), "proj": str(proj), "emb": emb,
            "ds": synthetic_dataset["dataset_dir"],
            "img": synthetic_dataset["image_dir"],
            "graph": synthetic_graph["root"]}


EPOCHS = 6  # 36 steps at batch 4: BN running stats calibrated (see header)
BASE = ["--epochs", str(EPOCHS), "--batch", "4", "--num_workers", "2"]


def _data_args(env):
    return ["--dataset_path", env["ds"], "--image_path", env["img"]]


def test_train_baseline_e2e(env, tmp_path, capsys):
    from artgraph_tpu.cli import train_baseline

    acc = train_baseline.main(_data_args(env) + BASE + [
        "--label", "style", "--results_dir", str(tmp_path / "res")])
    _assert_learning(_train_losses(capsys), EPOCHS)
    _assert_above_chance(acc, "style")
    assert os.path.exists(os.path.join(
        env["ck"], "style_resnet_baseline_single-task_checkpoint.pt"))
    assert os.path.exists(tmp_path / "res" / "results.csv")


def test_train_baseline_with_weights_and_tracking(env, tmp_path, monkeypatch,
                                                  capsys):
    monkeypatch.chdir(tmp_path)
    from artgraph_tpu.cli import train_baseline

    acc = train_baseline.main(_data_args(env) + BASE + [
        "--label", "genre", "--with_weights", "--tracking"])
    _assert_learning(_train_losses(capsys), EPOCHS)
    _assert_above_chance(acc, "genre")
    assert os.path.isdir(tmp_path / "mlruns")


def test_train_baseline_multitask_e2e(env, capsys):
    from artgraph_tpu.cli import train_baseline_multitask

    style_acc, genre_acc = train_baseline_multitask.main(_data_args(env) + BASE)
    _assert_learning(_train_losses(capsys), EPOCHS)
    _assert_above_chance(style_acc, "style")
    _assert_above_chance(genre_acc, "genre")


def test_full_four_stage_pipeline(env, capsys):
    """GNN -> projector -> generate_projections -> new_multimodal_multitask."""
    from artgraph_tpu import config
    from artgraph_tpu.cli import (
        generate_projections,
        train_new_multimodal_multitask,
        train_projector,
    )
    from artgraph_tpu.cli import train_gnn_embeddings
    from artgraph_tpu.data.embeddings import load_embedding, save_embedding

    # stage 1: GNN embeddings over the toy KG
    orig_ds = config.DATASET_DIR
    config.DATASET_DIR = env["graph"]
    try:
        train_gnn_embeddings.main(["--label", "style", "--epochs", "3"])
    finally:
        config.DATASET_DIR = orig_ds
    emb = load_embedding(os.path.join(env["emb"], "test_gnn_artwork_style_embs.pt"))
    assert emb.shape == (12, 128)

    # the image dataset has 24 train rows; resize the embedding table to match
    n_train = 24
    table = np.tile(emb, (2, 1))[:n_train]
    for name in ("gnn_style_embs_graph.pt", "gnn_genre_embs_graph.pt"):
        save_embedding(os.path.join(env["emb"], name), table)

    # stage 2: projector on the seeded 80/10/10 split
    train_projector.main(_data_args(env) + BASE + [
        "--exp", "e2e", "--node_embedding", "gnn_style_embs_graph.pt",
        "--emb_type", "artwork"])
    assert os.path.exists(os.path.join(env["proj"], "e2e_checkpoint_projector.pt"))

    # stage 3: order-preserving projection generation for valid/test
    generate_projections.main([])
    for split in ("validation", "test"):
        p = load_embedding(os.path.join(env["ds"], split, "embeddings",
                                        "e2e_checkpoint_projector.pt"))
        assert p.shape == (8, 128)

    # stage 4: the proposed fusion model end-to-end. Drain (and discard —
    # re-echoing would be captured again) stage 1-3 output so the learning
    # assertion sees only stage 4's epochs.
    capsys.readouterr()
    style_acc, genre_acc = train_new_multimodal_multitask.main(
        _data_args(env) + BASE + [
            "--architecture", "resnet", "--emb_type", "artwork",
            "--emb_train_style", "gnn_style_embs_graph.pt",
            "--emb_train_genre", "gnn_genre_embs_graph.pt",
            "--emb_valid_style", "e2e_checkpoint_projector.pt",
            "--emb_valid_genre", "e2e_checkpoint_projector.pt",
            "--emb_test_style", "e2e_checkpoint_projector.pt",
            "--emb_test_genre", "e2e_checkpoint_projector.pt"])
    _assert_learning(_train_losses(capsys), EPOCHS)
    _assert_above_chance(style_acc, "style")
    _assert_above_chance(genre_acc, "genre")


def test_context_trainer_e2e(env, capsys):
    from artgraph_tpu.cli import train_baseline_context
    from artgraph_tpu.data.embeddings import save_embedding

    rng = np.random.default_rng(0)
    save_embedding(os.path.join(env["emb"], "ctx_embs.pt"),
                   rng.normal(size=(24, 128)).astype(np.float32))
    acc = train_baseline_context.main(_data_args(env) + BASE + [
        "--net", "multi-modal", "--label", "genre",
        "--emb_type", "artwork", "--emb_train", "ctx_embs.pt"])
    _assert_learning(_train_losses(capsys), EPOCHS)
    _assert_above_chance(acc, "genre")


def test_data_parallel_training(env, capsys):
    """DP over a 4-device mesh of the 8-device CPU platform: same CLI,
    --data_parallel 4 (batch 4 = 1 image/device; the global batch must
    divide the mesh, and mesh-8 kernel coverage lives in the dedicated
    shard_map suites)."""
    from artgraph_tpu.cli import train_baseline

    acc = train_baseline.main(_data_args(env) + BASE + [
        "--label", "style", "--data_parallel", "4"])
    _assert_learning(_train_losses(capsys), EPOCHS)
    _assert_above_chance(acc, "style")
