"""--resume crash recovery: the full train state (params + opt_state + BN
stats + epoch + early-stop state) round-trips through Orbax and training
continues from the saved epoch. The reference has no resume at all
(save-only best checkpoints, ref: src/models/models.py:37-39)."""
import os

import jax
import numpy as np
import pytest


@pytest.fixture()
def env(synthetic_dataset, tmp_path, monkeypatch):
    from artgraph_tpu import config
    ck = tmp_path / "ckpts"
    ck.mkdir()
    monkeypatch.setattr(config, "CHECKPOINTS_DIR", str(ck))
    return {"tmp": tmp_path, "ds": synthetic_dataset}


def _run_baseline(env, epochs, resume_dir):
    from artgraph_tpu.cli import train_baseline
    return train_baseline.main([
        "--dataset_path", env["ds"]["dataset_dir"],
        "--image_path", env["ds"]["image_dir"],
        "--label", "style", "--epochs", str(epochs), "--batch", "8",
        "--num_workers", "2", "--resume", resume_dir])


def test_image_trainer_resume_matches_uninterrupted(env, capsys):
    resume_dir = str(env["tmp"] / "resume_a")
    _run_baseline(env, 2, resume_dir)  # "crashes" after epoch 2

    # restart asking for 4 epochs: must resume at epoch 2, not restart
    _run_baseline(env, 4, resume_dir)
    out = capsys.readouterr().out
    assert f"resumed from {resume_dir}: epoch 2" in out

    import json
    meta = json.load(open(os.path.join(resume_dir, "meta.json")))
    assert meta["epoch"] == 4

    # a resumed run saw 4 distinct training epochs: its saved state's step
    # count equals an uninterrupted 4-epoch run's (3 batches/epoch of 24/8)
    from artgraph_tpu.checkpointing import restore_checkpoint
    restored = restore_checkpoint(os.path.join(resume_dir, "state"))
    assert int(np.asarray(restored["step"])) == 12


def test_gnn_trainer_resume(synthetic_graph, tmp_path, monkeypatch, capsys):
    from artgraph_tpu import config
    from artgraph_tpu.cli import train_gnn_embeddings

    emb = tmp_path / "emb"
    monkeypatch.setattr(config, "DATASET_DIR", synthetic_graph["root"])
    monkeypatch.setattr(config, "EMBEDDINGS_DIR", str(emb))
    resume_dir = str(tmp_path / "resume_gnn")

    train_gnn_embeddings.main(["--label", "style", "--epochs", "6",
                               "--resume", resume_dir])
    train_gnn_embeddings.main(["--label", "style", "--epochs", "8",
                               "--resume", resume_dir])
    out = capsys.readouterr().out
    assert f"resumed from {resume_dir}: epoch 6" in out
    assert os.path.exists(os.path.join(resume_dir, "state"))
