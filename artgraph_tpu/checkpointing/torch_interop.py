"""torch state_dict <-> Flax variables conversion for every model class.

The reference saves/loads raw torch state_dicts (ref: src/models/models.py:39
torch.save(model.state_dict()); train_baseline.py:108 load_state_dict). This
module preserves that checkpoint format in both directions so

  * published reference checkpoints (incl. pretrained torchvision/timm
    backbones inside them) import into the Flax models, and
  * our checkpoints export to .pt files the reference code can load.

Key layout facts encoded here:
  * most reference models wrap the torchvision trunk in
    nn.Sequential(*children[:-1]) so trunk keys are index-prefixed
    (resnet.0.* = conv1, resnet.1.* = bn1, resnet.4..7.* = layer1..4)
    — ref: src/models/models.py:53;
  * MultiModal{Single,Multi}Task instead set resnet.fc = Identity and keep
    torchvision's named keys (resnet.conv1.*) — ref: src/models/models_kg.py:73;
  * timm ViT keys (patch_embed.proj, cls_token, pos_embed, blocks.N.*, norm)
    — ref: src/models/models_kg.py:200;
  * torch Linear weights are [out, in] (transposed vs flax [in, out]); torch
    convs are OIHW (vs flax HWIO).

torch is used strictly as an IO codec (torch.load/torch.save of cpu tensors).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# Sequential(*children[:-1]) index -> torchvision child name
# (children order: conv1, bn1, relu, maxpool, layer1..4, avgpool)
_SEQ_INDEX = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
              "6": "layer3", "7": "layer4"}
_SEQ_INDEX_INV = {v: k for k, v in _SEQ_INDEX.items()}

RESNET_STAGES = (3, 4, 6, 3)
VIT_DEPTH = 12


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def _conv_in(w) -> np.ndarray:   # OIHW -> HWIO
    return _t(w).transpose(2, 3, 1, 0)


def _conv_out(k) -> np.ndarray:  # HWIO -> OIHW
    return _t(k).transpose(3, 2, 0, 1)


def _lin_in(w) -> np.ndarray:    # [out,in] -> [in,out]
    return _t(w).transpose(1, 0)


def _lin_out(k) -> np.ndarray:
    return _t(k).transpose(1, 0)


# --------------------------------------------------------------------------
# ResNet50 trunk
# --------------------------------------------------------------------------

def _resnet_block_names():
    for stage, blocks in enumerate(RESNET_STAGES):
        for block in range(blocks):
            yield f"layer{stage + 1}", block, f"layer{stage + 1}_{block}"


def resnet_from_torch(sd: Dict[str, np.ndarray], prefix: str,
                      seq: bool) -> Tuple[dict, dict]:
    """Extract ResNet50 trunk params/batch_stats from a torch state_dict.

    seq=True reads index-prefixed keys (resnet.0.*), else named (resnet.conv1.*).
    """
    def key(child: str, rest: str) -> str:
        stem = _SEQ_INDEX_INV[child] if seq else child
        return f"{prefix}.{stem}.{rest}"

    def bn(child: str, sub: str):
        base = f"{sub}." if sub else ""
        p = {"scale": _t(sd[key(child, f"{base}weight")]),
             "bias": _t(sd[key(child, f"{base}bias")])}
        s = {"mean": _t(sd[key(child, f"{base}running_mean")]),
             "var": _t(sd[key(child, f"{base}running_var")])}
        return p, s

    params: dict = {}
    stats: dict = {}

    params["conv1"] = {"kernel": _conv_in(sd[key("conv1", "weight")])}
    params["bn1"], stats["bn1"] = bn("bn1", "")

    for layer, block, flax_name in _resnet_block_names():
        p: dict = {}
        s: dict = {}
        for i in (1, 2, 3):
            p[f"conv{i}"] = {"kernel": _conv_in(sd[key(layer, f"{block}.conv{i}.weight")])}
            p[f"bn{i}"], s[f"bn{i}"] = bn(layer, f"{block}.bn{i}")
        if key(layer, f"{block}.downsample.0.weight") in sd:
            p["downsample_conv"] = {"kernel": _conv_in(sd[key(layer, f"{block}.downsample.0.weight")])}
            p["downsample_bn"], s["downsample_bn"] = bn(layer, f"{block}.downsample.1")
        params[flax_name] = p
        stats[flax_name] = s
    return params, stats


def resnet_to_torch(params: dict, stats: dict, prefix: str,
                    seq: bool) -> Dict[str, np.ndarray]:
    def key(child: str, rest: str) -> str:
        stem = _SEQ_INDEX_INV[child] if seq else child
        return f"{prefix}.{stem}.{rest}"

    out: Dict[str, np.ndarray] = {}

    def bn_out(p: dict, s: dict, child: str, rest: str):
        r = (rest + ".") if rest else ""
        out[key(child, f"{r}weight")] = _t(p["scale"])
        out[key(child, f"{r}bias")] = _t(p["bias"])
        out[key(child, f"{r}running_mean")] = _t(s["mean"])
        out[key(child, f"{r}running_var")] = _t(s["var"])
        out[key(child, f"{r}num_batches_tracked")] = np.asarray(0, dtype=np.int64)

    out[key("conv1", "weight")] = _conv_out(params["conv1"]["kernel"])
    bn_out(params["bn1"], stats["bn1"], "bn1", "")

    for layer, block, flax_name in _resnet_block_names():
        p, s = params[flax_name], stats[flax_name]
        for i in (1, 2, 3):
            out[key(layer, f"{block}.conv{i}.weight")] = _conv_out(p[f"conv{i}"]["kernel"])
            bn_out(p[f"bn{i}"], s[f"bn{i}"], layer, f"{block}.bn{i}")
        if "downsample_conv" in p:
            out[key(layer, f"{block}.downsample.0.weight")] = _conv_out(p["downsample_conv"]["kernel"])
            bn_out(p["downsample_bn"], s["downsample_bn"], layer, f"{block}.downsample.1")
    return out


# --------------------------------------------------------------------------
# ViT-B/16 trunk (timm key names)
# --------------------------------------------------------------------------

def vit_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    p = lambda k: sd[f"{prefix}.{k}"]
    params: dict = {
        "patch_embed": {"kernel": _conv_in(p("patch_embed.proj.weight")),
                        "bias": _t(p("patch_embed.proj.bias"))},
        "cls_token": _t(p("cls_token")),
        "pos_embed": _t(p("pos_embed")),
        "norm": {"scale": _t(p("norm.weight")), "bias": _t(p("norm.bias"))},
    }
    for i in range(VIT_DEPTH):
        b = f"blocks.{i}"
        params[f"block{i}"] = {
            "norm1": {"scale": _t(p(f"{b}.norm1.weight")),
                      "bias": _t(p(f"{b}.norm1.bias"))},
            "attn": {
                "qkv": {"kernel": _lin_in(p(f"{b}.attn.qkv.weight")),
                        "bias": _t(p(f"{b}.attn.qkv.bias"))},
                "proj": {"kernel": _lin_in(p(f"{b}.attn.proj.weight")),
                         "bias": _t(p(f"{b}.attn.proj.bias"))},
            },
            "norm2": {"scale": _t(p(f"{b}.norm2.weight")),
                      "bias": _t(p(f"{b}.norm2.bias"))},
            "mlp": {
                "fc1": {"kernel": _lin_in(p(f"{b}.mlp.fc1.weight")),
                        "bias": _t(p(f"{b}.mlp.fc1.bias"))},
                "fc2": {"kernel": _lin_in(p(f"{b}.mlp.fc2.weight")),
                        "bias": _t(p(f"{b}.mlp.fc2.bias"))},
            },
        }
    return params


def vit_to_torch(params: dict, prefix: str) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {
        f"{prefix}.patch_embed.proj.weight": _conv_out(params["patch_embed"]["kernel"]),
        f"{prefix}.patch_embed.proj.bias": _t(params["patch_embed"]["bias"]),
        f"{prefix}.cls_token": _t(params["cls_token"]),
        f"{prefix}.pos_embed": _t(params["pos_embed"]),
        f"{prefix}.norm.weight": _t(params["norm"]["scale"]),
        f"{prefix}.norm.bias": _t(params["norm"]["bias"]),
    }
    for i in range(VIT_DEPTH):
        blk = params[f"block{i}"]
        b = f"{prefix}.blocks.{i}"
        out[f"{b}.norm1.weight"] = _t(blk["norm1"]["scale"])
        out[f"{b}.norm1.bias"] = _t(blk["norm1"]["bias"])
        out[f"{b}.attn.qkv.weight"] = _lin_out(blk["attn"]["qkv"]["kernel"])
        out[f"{b}.attn.qkv.bias"] = _t(blk["attn"]["qkv"]["bias"])
        out[f"{b}.attn.proj.weight"] = _lin_out(blk["attn"]["proj"]["kernel"])
        out[f"{b}.attn.proj.bias"] = _t(blk["attn"]["proj"]["bias"])
        out[f"{b}.norm2.weight"] = _t(blk["norm2"]["scale"])
        out[f"{b}.norm2.bias"] = _t(blk["norm2"]["bias"])
        out[f"{b}.mlp.fc1.weight"] = _lin_out(blk["mlp"]["fc1"]["kernel"])
        out[f"{b}.mlp.fc1.bias"] = _t(blk["mlp"]["fc1"]["bias"])
        out[f"{b}.mlp.fc2.weight"] = _lin_out(blk["mlp"]["fc2"]["kernel"])
        out[f"{b}.mlp.fc2.bias"] = _t(blk["mlp"]["fc2"]["bias"])
    return out


# --------------------------------------------------------------------------
# Per-model specs
# --------------------------------------------------------------------------
# trunk: (kind, torch_prefix, flax_name); kind in {resnet_seq, resnet_named, vit}
# heads: flax module name -> (torch_prefix, kind); kind in
#   {linear, seq_linear (Sequential(Dropout, Linear) -> .1), tanh_encoder}

_MODEL_SPECS = {
    "ResnetSingleTask": {
        "trunk": ("resnet_seq", "resnet", "resnet"),
        "heads": {"classifier": ("classifier", "seq_linear")},
    },
    "ResnetMultiTask": {
        "trunk": ("resnet_seq", "resnet", "resnet"),
        "heads": {"style_classifier": ("style_classifier", "seq_linear"),
                  "genre_classifier": ("genre_classifier", "seq_linear")},
    },
    "ViTSingleTask": {
        # timm model with vit.head replaced by Sequential(Dropout, Linear)
        # (ref: src/models/models.py:100)
        "trunk": ("vit", "vit", "vit"),
        "heads": {"head": ("vit.head", "seq_linear")},
    },
    "ViTMultiTask": {
        "trunk": ("vit", "vit", "vit"),
        "heads": {"style_classifier": ("style_classifier", "seq_linear"),
                  "genre_classifier": ("genre_classifier", "seq_linear")},
        "vit_orig_head": True,
    },
    "ContextNetSingleTask": {
        "trunk": ("resnet_seq", "resnet", "resnet"),
        "heads": {"classifier": ("classifier", "linear"),
                  "encoder": ("encoder", "linear")},
    },
    "ContextNetlMultiTask": {
        "trunk": ("resnet_seq", "resnet", "resnet"),
        "heads": {"class_style": ("class_style", "linear"),
                  "class_genre": ("class_genre", "linear"),
                  "encoder": ("encoder", "linear")},
    },
    "MultiModalSingleTask": {
        # named trunk keys: resnet.fc = Identity (ref: models_kg.py:73)
        "trunk": ("resnet_named", "resnet", "resnet"),
        "heads": {"classifier": ("classifier", "seq_linear"),
                  "encoder": ("encoder", "tanh_encoder")},
    },
    "MultiModalMultiTask": {
        "trunk": ("resnet_named", "resnet", "resnet"),
        "heads": {"class_style": ("class_style", "seq_linear"),
                  "class_genre": ("class_genre", "seq_linear"),
                  "encoder": ("encoder", "tanh_encoder")},
    },
    "NewMultiModalSingleTask": {
        "trunk": ("resnet_seq", "resnet", "resnet"),
        "heads": {"classifier": ("classifier", "seq_linear")},
    },
    "NewMultiModalMultiTask": {
        "trunk": ("resnet_seq", "resnet", "resnet"),
        "heads": {"class_style": ("class_style", "seq_linear"),
                  "class_genre": ("class_genre", "seq_linear")},
    },
    "NewMultiModalSingleTaskVit": {
        "trunk": ("vit", "vit", "vit"),
        "heads": {"classifier": ("classifier", "seq_linear")},
        "vit_orig_head": True,
    },
    "NewMultiModalMultiTaskViT": {
        "trunk": ("vit", "vit", "vit"),
        "heads": {"class_style": ("class_style", "seq_linear"),
                  "class_genre": ("class_genre", "seq_linear")},
        "vit_orig_head": True,
    },
    "LabelProjector": {
        "trunk": ("resnet_seq", "resnet", "resnet"),
        "heads": {"encoder": ("encoder", "linear")},
    },
    "LabelProjectorVit": {
        "trunk": ("vit", "vit", "vit"),
        "heads": {"encoder": ("encoder", "linear")},
        "vit_orig_head": True,
    },
}


def _head_from_torch(sd, torch_prefix: str, kind: str) -> dict:
    if kind == "linear":
        return {"kernel": _lin_in(sd[f"{torch_prefix}.weight"]),
                "bias": _t(sd[f"{torch_prefix}.bias"])}
    if kind == "seq_linear":
        return {"linear": {"kernel": _lin_in(sd[f"{torch_prefix}.1.weight"]),
                           "bias": _t(sd[f"{torch_prefix}.1.bias"])}}
    if kind == "tanh_encoder":
        return {"fc1": {"kernel": _lin_in(sd[f"{torch_prefix}.0.weight"]),
                        "bias": _t(sd[f"{torch_prefix}.0.bias"])},
                "fc2": {"kernel": _lin_in(sd[f"{torch_prefix}.2.weight"]),
                        "bias": _t(sd[f"{torch_prefix}.2.bias"])}}
    raise ValueError(kind)


def _head_to_torch(params: dict, torch_prefix: str, kind: str) -> dict:
    if kind == "linear":
        return {f"{torch_prefix}.weight": _lin_out(params["kernel"]),
                f"{torch_prefix}.bias": _t(params["bias"])}
    if kind == "seq_linear":
        lin = params["linear"]
        return {f"{torch_prefix}.1.weight": _lin_out(lin["kernel"]),
                f"{torch_prefix}.1.bias": _t(lin["bias"])}
    if kind == "tanh_encoder":
        return {f"{torch_prefix}.0.weight": _lin_out(params["fc1"]["kernel"]),
                f"{torch_prefix}.0.bias": _t(params["fc1"]["bias"]),
                f"{torch_prefix}.2.weight": _lin_out(params["fc2"]["kernel"]),
                f"{torch_prefix}.2.bias": _t(params["fc2"]["bias"])}
    raise ValueError(kind)


def import_model_state(model_name: str, sd: Dict[str, np.ndarray]) -> dict:
    """torch state_dict -> flax variables {'params', 'batch_stats'}."""
    spec = _MODEL_SPECS[model_name]
    kind, tprefix, fname = spec["trunk"]
    params: dict = {}
    stats: dict = {}
    if kind in ("resnet_seq", "resnet_named"):
        params[fname], stats[fname] = resnet_from_torch(
            sd, tprefix, seq=(kind == "resnet_seq"))
    else:
        params[fname] = vit_from_torch(sd, tprefix)
    for flax_name, (torch_prefix, hkind) in spec["heads"].items():
        params[flax_name] = _head_from_torch(sd, torch_prefix, hkind)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return variables


def import_trunk_state(model_name: str, sd: Dict[str, np.ndarray]) -> dict:
    """Trunk-only import for warm starts (--init_checkpoint).

    Accepts RAW torchvision resnet50 ('conv1.weight', ...) and raw timm
    ViT ('cls_token', 'patch_embed.proj.weight', ...) state_dicts — the
    pretrained files the reference fine-tunes from (ref: models.py:51,97) —
    as well as this repo's wrapper-prefixed checkpoints of any model that
    shares the trunk. Heads are NOT imported.
    """
    spec = _MODEL_SPECS[model_name]
    kind, tprefix, fname = spec["trunk"]
    if kind in ("resnet_seq", "resnet_named"):
        if "conv1.weight" in sd:  # raw torchvision: named children, no prefix
            sd2 = {f"__t__.{k}": v for k, v in sd.items()}
            params, stats = resnet_from_torch(sd2, "__t__", seq=False)
        else:
            params, stats = resnet_from_torch(sd, tprefix,
                                              seq=(kind == "resnet_seq"))
        return {"params": {fname: params}, "batch_stats": {fname: stats}}
    if "cls_token" in sd:  # raw timm vit
        sd2 = {f"__t__.{k}": v for k, v in sd.items()}
        return {"params": {fname: vit_from_torch(sd2, "__t__")}}
    return {"params": {fname: vit_from_torch(sd, tprefix)}}


def export_model_state(model_name: str, variables: dict) -> Dict[str, np.ndarray]:
    """flax variables -> torch state_dict (reference-loadable key set)."""
    spec = _MODEL_SPECS[model_name]
    kind, tprefix, fname = spec["trunk"]
    params = variables["params"]
    sd: Dict[str, np.ndarray] = {}
    if kind in ("resnet_seq", "resnet_named"):
        stats = variables.get("batch_stats", {}).get(fname, {})
        sd.update(resnet_to_torch(params[fname], stats, tprefix,
                                  seq=(kind == "resnet_seq")))
    else:
        sd.update(vit_to_torch(params[fname], tprefix))
        if spec.get("vit_orig_head"):
            # timm's original 1000-class head survives in reference
            # state_dicts of models that never call it (strict-load compat)
            sd["vit.head.weight"] = np.zeros((1000, 768), np.float32)
            sd["vit.head.bias"] = np.zeros((1000,), np.float32)
    for flax_name, (torch_prefix, hkind) in spec["heads"].items():
        sd.update(_head_to_torch(params[flax_name], torch_prefix, hkind))
    return sd


def save_reference_checkpoint(model_name: str, variables: dict, path: str) -> None:
    """torch.save an exported state_dict (.pt, reference format)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v).copy()) if v.ndim else torch.tensor(v)
          for k, v in export_model_state(model_name, variables).items()}
    torch.save(sd, path)


def load_reference_checkpoint(model_name: str, path: str) -> dict:
    """torch.load a .pt state_dict and convert to flax variables."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in raw.items()}
    try:
        return import_model_state(model_name, sd)
    except KeyError as e:
        raise KeyError(
            f"checkpoint {path!r} does not match model {model_name!r}: "
            f"missing tensor {e.args[0]!r} (checkpoint has "
            f"{len(sd)} tensors, e.g. {sorted(sd)[:3]})") from e
