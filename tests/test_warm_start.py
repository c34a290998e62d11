"""--init_checkpoint warm start: imported subtrees are bit-identical at
init, unmatched subtrees stay fresh, raw torchvision trunks load (the
reference fine-tunes from torchvision/timm pretrained weights,
ref: src/models/models.py:51-53,97)."""
import sys

import jax
import numpy as np
import optax
import pytest
import torch

sys.path.insert(0, "tests")


def _flat(tree):
    return {jax.tree_util.keystr(p): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


@pytest.fixture()
def baseline_trainer():
    from artgraph_tpu.models import ResnetSingleTask
    from artgraph_tpu.train.trainer import Trainer
    from artgraph_tpu.train.losses import cross_entropy
    from artgraph_tpu.train.trainer import accuracy_metrics

    def fwd(images, batch):
        return (images,)

    def loss_fn(outputs, batch):
        return (cross_entropy(outputs, batch[1], mask=batch[2]),
                accuracy_metrics(outputs, batch[1], batch[2]))

    trainer = Trainer(ResnetSingleTask(num_class=32, dropout=0.4),
                      optax.adam(1e-3), fwd, loss_fn)
    batch = (np.zeros((2, 64, 64, 3), np.uint8),
             np.zeros((2,), np.int32), np.ones((2,), np.float32))
    return trainer, trainer.init(batch)


def test_full_checkpoint_roundtrip_is_bit_identical(baseline_trainer,
                                                    tmp_path):
    from artgraph_tpu.checkpointing import save_reference_checkpoint
    from artgraph_tpu.cli._common import apply_init_checkpoint

    trainer, state = baseline_trainer
    path = str(tmp_path / "full.pt")
    save_reference_checkpoint("ResnetSingleTask",
                              jax.device_get(trainer.variables(state)), path)

    # fresh init with a different seed, then warm-start from the export
    trainer2 = trainer
    trainer2.base_rng = jax.random.PRNGKey(99)
    batch = (np.zeros((2, 64, 64, 3), np.uint8),
             np.zeros((2,), np.int32), np.ones((2,), np.float32))
    fresh = trainer2.init(batch)
    warm = apply_init_checkpoint(trainer2, fresh, "ResnetSingleTask", path)

    src = _flat(jax.device_get(trainer.variables(state)))
    got = _flat(jax.device_get(trainer2.variables(warm)))
    for k, v in src.items():
        np.testing.assert_array_equal(got[k], v, err_msg=k)


def test_raw_torchvision_trunk_import(baseline_trainer, tmp_path):
    from _torch_oracles import ResNet50Oracle

    from artgraph_tpu.cli._common import apply_init_checkpoint

    trainer, state = baseline_trainer
    oracle = ResNet50Oracle()
    path = str(tmp_path / "raw_resnet50.pt")
    torch.save(oracle.state_dict(), path)

    fresh_vars = jax.device_get(trainer.variables(state))
    warm = apply_init_checkpoint(trainer, state, "ResnetSingleTask", path)
    got = jax.device_get(trainer.variables(warm))

    # trunk matches the torch weights (spot check conv1 + a deep block)
    w = oracle.state_dict()["conv1.weight"].numpy()
    np.testing.assert_array_equal(
        got["params"]["resnet"]["conv1"]["kernel"],
        w.transpose(2, 3, 1, 0))
    rv = oracle.state_dict()["layer3.2.bn2.running_var"].numpy()
    np.testing.assert_array_equal(
        got["batch_stats"]["resnet"]["layer3_2"]["bn2"]["var"], rv)
    # head stays freshly initialized (not present in the trunk file)
    np.testing.assert_array_equal(_head(got["params"]),
                                  _head(fresh_vars["params"]))


def _head(params):
    for k in params:
        if k != "resnet":
            leaves = jax.tree_util.tree_leaves(params[k])
            return np.asarray(leaves[0])
    raise AssertionError("no head subtree found")


def test_cli_trains_from_init_checkpoint(synthetic_dataset, tmp_path,
                                         capsys, monkeypatch):
    """End-to-end: export a checkpoint, train 1 epoch warm-started from it."""
    from artgraph_tpu import config

    from artgraph_tpu.checkpointing import save_reference_checkpoint
    from artgraph_tpu.cli import train_baseline

    trainer_ckpt = str(tmp_path / "warm.pt")
    # make a tiny real checkpoint by running the oracle-free export path
    from artgraph_tpu.models import ResnetSingleTask
    from artgraph_tpu.train.trainer import Trainer
    from artgraph_tpu.train.losses import cross_entropy
    from artgraph_tpu.train.trainer import accuracy_metrics
    t = Trainer(ResnetSingleTask(num_class=32, dropout=0.4),
                optax.adam(1e-3), lambda img, b: (img,),
                lambda o, b: (cross_entropy(o, b[1], mask=b[2]), {}))
    st = t.init((np.zeros((2, 64, 64, 3), np.uint8),
                 np.zeros((2,), np.int32), np.ones((2,), np.float32)))
    save_reference_checkpoint("ResnetSingleTask",
                              jax.device_get(t.variables(st)), trainer_ckpt)

    ck = tmp_path / "ckpts"
    ck.mkdir()
    monkeypatch.setattr(config, "CHECKPOINTS_DIR", str(ck))
    acc = train_baseline.main([
        "--dataset_path", synthetic_dataset["dataset_dir"],
        "--image_path", synthetic_dataset["image_dir"],
        "--label", "style", "--epochs", "1", "--batch", "8",
        "--num_workers", "2", "--init_checkpoint", trainer_ckpt])
    out = capsys.readouterr().out
    assert "init_checkpoint" in out and "imported" in out
    assert 0.0 <= acc <= 1.0
