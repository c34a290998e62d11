"""Generate the committed golden activation fixtures (tests/golden/).

Run ONCE (python tests/_make_goldens.py) and commit the npz. The goldens
pin today's verified numerics — backbone outputs from seeded torch-oracle
weights through the torch_interop converter, plus the Pallas kernel
surfaces — so future kernel/optimization work cannot silently drift the
numbers the parity story depends on (the live oracle tests would not
notice if model and oracle drifted together).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "golden")


def compute_goldens():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from _torch_oracles import ResNet50Oracle, ViTOracle, randomize_bn_stats
    from artgraph_tpu.checkpointing.torch_interop import (resnet_from_torch,
                                                          vit_from_torch)
    from artgraph_tpu.models import ResNet50, ViT

    out = {}

    torch.manual_seed(0)
    t_resnet = ResNet50Oracle().eval()
    randomize_bn_stats(t_resnet)
    sd = {f"resnet.{k}": v.detach().numpy()
          for k, v in t_resnet.state_dict().items()}
    params, stats = resnet_from_torch(sd, "resnet", seq=False)
    x = np.random.default_rng(0).normal(size=(2, 224, 224, 3)).astype(np.float32)
    out["resnet_in_seed"] = np.asarray(0)
    out["resnet_flax"] = np.asarray(ResNet50(dtype=jnp.float32).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False))
    with torch.no_grad():
        out["resnet_torch"] = t_resnet(
            torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    torch.manual_seed(1)
    t_vit = ViTOracle(depth=12).eval()
    sd = {f"vit.{k}": v.detach().numpy()
          for k, v in t_vit.state_dict().items()}
    params = vit_from_torch(sd, "vit")
    x = np.random.default_rng(1).normal(size=(2, 224, 224, 3)).astype(np.float32)
    out["vit_flax"] = np.asarray(ViT(dtype=jnp.float32).apply(
        {"params": params}, jnp.asarray(x), train=False))
    with torch.no_grad():
        out["vit_torch"] = t_vit.forward_features(
            torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    # Pallas surfaces (interpret mode on CPU — same kernel code as TPU)
    from artgraph_tpu.ops.attention import fused_attention
    rng = np.random.default_rng(2)
    q = rng.normal(size=(2, 197, 12, 64)).astype(np.float32)
    k = rng.normal(size=(2, 197, 12, 64)).astype(np.float32)
    v = rng.normal(size=(2, 197, 12, 64)).astype(np.float32)
    out["attention_out"] = np.asarray(
        fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

    from artgraph_tpu.ops.csr_segment import (build_csr, csr_segment_sum,
                                              csr_weighted_segment_sum)
    E, N = 4096, 300
    ei = np.stack([rng.integers(0, 500, E),
                   rng.integers(0, N, E)]).astype(np.int32)
    _, csr = build_csr(ei, N)
    data = rng.normal(size=(E, 128)).astype(np.float32)
    w = rng.normal(size=(E,)).astype(np.float32)
    out["csr_sum"] = np.asarray(csr_segment_sum(jnp.asarray(data), csr))
    num, den = csr_weighted_segment_sum(jnp.asarray(data), jnp.asarray(w),
                                        csr)
    out["csr_wsum"] = np.asarray(num)
    out["csr_wden"] = np.asarray(den)
    return out


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, "backbones.npz")
    np.savez_compressed(path, **compute_goldens())
    size = os.path.getsize(path)
    print(f"wrote {path} ({size/1024:.1f} KB)")
