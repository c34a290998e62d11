"""The committed pretrained-tensor manifest must match what the importer
actually consumes (VERDICT round-2 #6): names+shapes of raw torchvision
resnet50 / timm vit_base_patch16_224 state_dicts, and import_trunk_state
must accept exactly those layouts."""
import json
import os

import jax

import numpy as np
import torch

from artgraph_tpu.checkpointing.torch_interop import import_trunk_state

from _torch_oracles import ResNet50Oracle, ViTOracle

MANIFEST = os.path.join(os.path.dirname(__file__), "..", "artgraph_tpu",
                        "checkpointing", "pretrained_manifest.json")


def _load():
    with open(MANIFEST) as f:
        return json.load(f)


def test_resnet_manifest_matches_oracle_and_importer():
    man = _load()["torchvision_resnet50"]
    torch.manual_seed(0)
    sd = {k: v.detach().numpy() for k, v in
          ResNet50Oracle().state_dict().items()}
    # oracle == torchvision minus the fc head (present in raw files)
    for k, v in sd.items():
        assert k in man, f"oracle tensor {k} missing from manifest"
        assert list(v.shape) == man[k], k
    extra = set(man) - set(sd)
    assert extra == {"fc.weight", "fc.bias"}, extra

    variables = import_trunk_state("ResnetSingleTask", sd)
    assert "resnet" in variables["params"]
    assert "resnet" in variables["batch_stats"]
    # every non-fc manifest tensor was consumed (spot-check key count:
    # 53 convs + 53 BNs x4 stats/params... = 265 source tensors)
    n_leaves = len(jax.tree_util.tree_leaves(variables))
    assert n_leaves == sum(1 for k in man
                           if not k.startswith("fc.")
                           and not k.endswith("num_batches_tracked"))


def test_vit_manifest_matches_oracle_and_importer():
    man = _load()["timm_vit_base_patch16_224"]
    torch.manual_seed(0)
    sd = {k: v.detach().numpy() for k, v in
          ViTOracle(depth=12, img=224).state_dict().items()}
    for k, v in sd.items():
        assert k in man, f"oracle tensor {k} missing from manifest"
        assert list(v.shape) == man[k], k
    assert set(man) == set(sd)

    variables = import_trunk_state("ViTSingleTask", sd)
    assert "vit" in variables["params"]
    # head.* is ignored by the trunk importer
    n_leaves = len(jax.tree_util.tree_leaves(variables))
    assert n_leaves == sum(1 for k in man if not k.startswith("head."))

