"""Numerical parity of the Flax backbones against torch oracles through the
torch_interop weight converter — the north-star weight-fidelity requirement
(SURVEY.md §7 hard part #1)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from artgraph_tpu.checkpointing.torch_interop import (
    export_model_state,
    import_model_state,
    resnet_from_torch,
    vit_from_torch,
)
from artgraph_tpu.models import ResNet50, ViT

from _torch_oracles import ResNet50Oracle, ViTOracle, randomize_bn_stats


@pytest.fixture(scope="module")
def torch_resnet():
    torch.manual_seed(0)
    model = ResNet50Oracle().eval()
    randomize_bn_stats(model)
    return model


@pytest.fixture(scope="module")
def torch_vit():
    torch.manual_seed(1)
    model = ViTOracle(depth=12).eval()
    return model


def _np_sd(model, prefix):
    return {f"{prefix}.{k}": v.detach().numpy()
            for k, v in model.state_dict().items()}


def test_resnet50_matches_torch(torch_resnet):
    sd = _np_sd(torch_resnet, "resnet")
    params, stats = resnet_from_torch(sd, "resnet", seq=False)

    x = np.random.default_rng(0).normal(size=(2, 224, 224, 3)).astype(np.float32)
    flax_model = ResNet50(dtype=jnp.float32)
    out = flax_model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)

    with torch.no_grad():
        ref = torch_resnet(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_vit_matches_torch(torch_vit):
    sd = _np_sd(torch_vit, "vit")
    params = vit_from_torch(sd, "vit")

    x = np.random.default_rng(1).normal(size=(2, 224, 224, 3)).astype(np.float32)
    flax_model = ViT(dtype=jnp.float32)
    out = flax_model.apply({"params": params}, jnp.asarray(x), train=False)

    with torch.no_grad():
        ref = torch_vit.forward_features(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_resnet_seq_naming_roundtrip(torch_resnet):
    """Sequential-index keys (reference checkpoints) == named keys renamed."""
    named = _np_sd(torch_resnet, "resnet")
    rename = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
              "layer3": "6", "layer4": "7"}
    seq_sd = {}
    for k, v in named.items():
        parts = k.split(".")
        if parts[1] in rename:
            parts[1] = rename[parts[1]]
            seq_sd[".".join(parts)] = v
    p_named, s_named = resnet_from_torch(named, "resnet", seq=False)
    p_seq, s_seq = resnet_from_torch(seq_sd, "resnet", seq=True)

    import jax
    named_leaves = sorted(jax.tree_util.tree_leaves_with_path(p_named),
                          key=lambda kv: str(kv[0]))
    seq_leaves = sorted(jax.tree_util.tree_leaves_with_path(p_seq),
                        key=lambda kv: str(kv[0]))
    for (ka, a), (kb, b) in zip(named_leaves, seq_leaves):
        assert str(ka) == str(kb)
        np.testing.assert_array_equal(a, b)


def test_full_model_state_roundtrip(torch_resnet):
    """import -> export reproduces every tensor of a composite state_dict."""
    trunk = _np_sd(torch_resnet, "resnet")
    rename = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
              "layer3": "6", "layer4": "7"}
    sd = {}
    for k, v in trunk.items():
        parts = k.split(".")
        parts[1] = rename[parts[1]]
        sd[".".join(parts)] = v
    rng = np.random.default_rng(2)
    sd["classifier.1.weight"] = rng.normal(size=(32, 2048)).astype(np.float32)
    sd["classifier.1.bias"] = rng.normal(size=(32,)).astype(np.float32)

    variables = import_model_state("ResnetSingleTask", sd)
    back = export_model_state("ResnetSingleTask", variables)

    for k, v in sd.items():
        np.testing.assert_array_equal(back[k], v, err_msg=k)
    extra = set(back) - set(sd)
    assert all(k.endswith("num_batches_tracked") for k in extra)


def test_head_models_shapes():
    """Every model class initializes and emits reference-shaped outputs."""
    import jax
    from artgraph_tpu import models as m

    key = jax.random.PRNGKey(0)
    img = jnp.zeros((2, 224, 224, 3), jnp.float32)
    emb = jnp.zeros((2, 128), jnp.float32)
    nc = {"style": 32, "genre": 18}

    def init_apply(model, *args):
        variables = model.init(key, *args, train=False)
        return model.apply(variables, *args, train=False)

    assert init_apply(m.ResnetSingleTask(18, 0.4, dtype=jnp.float32), img).shape == (2, 18)
    outs = init_apply(m.ResnetMultiTask(nc, 0.4, dtype=jnp.float32), img)
    assert outs[0].shape == (2, 32) and outs[1].shape == (2, 18)

    out, proj = init_apply(m.ContextNetSingleTask(128, 18, dtype=jnp.float32), img)
    assert out.shape == (2, 18) and proj.shape == (2, 128)

    out, proj = init_apply(m.MultiModalSingleTask(128, 18, dtype=jnp.float32), img)
    assert out.shape == (2, 18) and proj.shape == (2, 128)

    out = init_apply(m.NewMultiModalSingleTask(128, 18, 0.4, dtype=jnp.float32), img, emb)
    assert out.shape == (2, 18)
    outs = init_apply(m.NewMultiModalMultiTask(128, nc, 0.4, dtype=jnp.float32), img, emb, emb)
    assert outs[0].shape == (2, 32) and outs[1].shape == (2, 18)

    assert init_apply(m.LabelProjector(128, dtype=jnp.float32), img).shape == (2, 128)
