"""Orbax train-state round-trip and reference-.pt checkpoint IO."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from artgraph_tpu.checkpointing import (
    load_reference_checkpoint,
    restore_checkpoint,
    save_checkpoint,
    save_reference_checkpoint,
)
from artgraph_tpu.train.train_state import TrainState


def test_orbax_train_state_roundtrip(tmp_path):
    params = {"dense": {"kernel": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
                        "bias": jnp.ones((4,))}}
    tx = optax.adam(1e-3)
    state = TrainState(step=7, params=params, batch_stats={},
                       opt_state=tx.init(params))
    path = str(tmp_path / "ck")
    save_checkpoint(path, state)
    restored = restore_checkpoint(path, target=jax.tree_util.tree_map(
        lambda x: x, state))
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["dense"]["kernel"]),
                                  np.asarray(params["dense"]["kernel"]))
    # optimizer state survives (the reference never saved it)
    leaves_a = jax.tree_util.tree_leaves(state.opt_state)
    leaves_b = jax.tree_util.tree_leaves(restored.opt_state)
    assert len(leaves_a) == len(leaves_b)


def test_reference_pt_roundtrip_all_models(tmp_path):
    """Every spec'd model class exports to a torch-loadable .pt and imports
    back to identical variables."""
    import torch

    from artgraph_tpu import models as m

    key = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 224, 224, 3), jnp.float32)
    emb = jnp.zeros((1, 128), jnp.float32)
    nc = {"style": 32, "genre": 18}
    cases = [
        ("ContextNetlMultiTask", m.ContextNetlMultiTask(128, nc, dtype=jnp.float32), (img,)),
        ("MultiModalMultiTask", m.MultiModalMultiTask(128, nc, dtype=jnp.float32), (img,)),
        ("NewMultiModalMultiTask", m.NewMultiModalMultiTask(128, nc, 0.4, dtype=jnp.float32), (img, emb, emb)),
        ("LabelProjector", m.LabelProjector(128, dtype=jnp.float32), (img,)),
    ]
    for name, model, args in cases:
        variables = model.init(key, *args, train=False)
        path = str(tmp_path / f"{name}.pt")
        save_reference_checkpoint(name, jax.device_get(variables), path)
        sd = torch.load(path, weights_only=False)
        assert all(hasattr(v, "numpy") for v in sd.values()), name
        restored = load_reference_checkpoint(name, path)
        out_a = model.apply(variables, *args, train=False)
        out_b = model.apply(restored, *args, train=False)
        for a, b in zip(jax.tree_util.tree_leaves(out_a),
                        jax.tree_util.tree_leaves(out_b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)
