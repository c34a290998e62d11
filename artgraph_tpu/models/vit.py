"""ViT-B/16 in Flax, numerics-compatible with timm's vit_base_patch16_224.

The reference uses timm's pretrained ViT (ref: src/models/models.py:97,112;
src/models/models_kg.py:200,222) under the ~2021 stack where
`forward_features` returns the CLS token after the final LayerNorm (pooled
768-dim vector) — SURVEY.md §3.5. This module reproduces that contract:
`pool=True` (default) returns [B, 768]; `pool=False` returns the full token
sequence for downstream experimentation.

TPU-first choices: bf16 compute / f32 params, LayerNorm in f32, bf16
residual stream, and a fused pad-free Pallas attention kernel
(artgraph_tpu.ops.attention, +18.5% train throughput over XLA's fusion at
this geometry on v5e).
"""
from __future__ import annotations

import contextlib
import contextvars
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from artgraph_tpu.models.resnet import at_least_f32

Dtype = Any

# Trace-scope switch for the Pallas attention kernels. Under an AUTO-sharded
# jit (data parallelism via NamedSharding-annotated operands), jax cannot
# partition a pallas_call — it requires Manual (shard_map) mesh axes
# (jax._src.pallas.pallas_call._pallas_call_abstract_eval) — so XLA would
# replicate the kernel's operands across the mesh: every device would run
# the FULL global batch. Trainers enter this context when tracing a step
# over a multi-device mesh so attention falls back to XLA's partitionable
# path. The edge-sharded GNN kernels are unaffected: they already run
# inside shard_map (Manual axes), which is the kernel-correct design.
_FORCE_XLA_ATTENTION: contextvars.ContextVar = contextvars.ContextVar(
    "force_xla_attention", default=False)

# Trace-scope switch in the OPPOSITE direction: force the fused Pallas
# kernels ON even off-TPU, where they execute in Pallas interpret mode
# (ops.attention._use_interpret). This is how the production kernel path is
# exercised INSIDE shard_map on the virtual CPU mesh — the same pattern the
# CSR GNN kernels use (ops/csr_segment.py) — so the multi-device
# kernel-under-Manual-axes configuration has real executions in tests and in
# the MULTICHIP dryrun instead of silently falling back to XLA attention.
# The ARTGRAPH_PALLAS_ON_CPU=1 env var is the subprocess-friendly spelling.
_FORCE_PALLAS_KERNELS: contextvars.ContextVar = contextvars.ContextVar(
    "force_pallas_kernels", default=False)


@contextlib.contextmanager
def force_xla_attention():
    """Disable the Pallas attention kernels for traces opened in this scope."""
    token = _FORCE_XLA_ATTENTION.set(True)
    try:
        yield
    finally:
        _FORCE_XLA_ATTENTION.reset(token)


@contextlib.contextmanager
def force_pallas_kernels():
    """Force the fused Pallas kernels ON for traces opened in this scope,
    even off-TPU (interpret mode). A force_xla_attention scope still wins:
    it marks traces where pallas_call is structurally unusable
    (auto-sharded multi-device jit)."""
    token = _FORCE_PALLAS_KERNELS.set(True)
    try:
        yield
    finally:
        _FORCE_PALLAS_KERNELS.reset(token)


def _pallas_kernels_forced() -> bool:
    import os

    return (_FORCE_PALLAS_KERNELS.get()
            or os.environ.get("ARTGRAPH_PALLAS_ON_CPU", "") == "1")


def _pallas_attention_on(use_pallas: bool) -> bool:
    """Pallas attention kernels run on TPU traces unless a force_xla scope
    (auto-sharded multi-device jit) is active; off-TPU they run (interpreted)
    only inside a force_pallas_kernels scope / ARTGRAPH_PALLAS_ON_CPU=1."""
    if not use_pallas or _FORCE_XLA_ATTENTION.get():
        return False
    return (jax.devices()[0].platform != "cpu"
            or _pallas_kernels_forced())


class _LNParams(nn.Module):
    """Declares nn.LayerNorm-shaped (scale, bias) WITHOUT the normalization.

    Same param names/shapes/dtypes/initializers as nn.LayerNorm, so the
    parameter tree and checkpoint key maps are identical whether the LN runs
    as a flax module or inside the fused block kernel.
    """

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        return scale, bias


class _DenseParams(nn.Module):
    """Declares an nn.Dense-shaped (kernel, bias) pair WITHOUT the matmul.

    Same param names, shapes, dtypes, and initializers as nn.Dense, so the
    parameter tree (and the path-derived init RNG stream) is identical —
    torch-interop key maps and checkpoints are unaffected. Used when the
    projection itself runs inside a Pallas kernel.
    """

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class Attention(nn.Module):
    """timm-style MHA: fused qkv (bias), scaled dot-product, output proj.

    On TPU the qkv projection AND the scaled-dot-product run in one Pallas
    kernel (ops.attention.fused_qkv_attention): the [B, N, 3C] projection
    never round-trips HBM and the [B,N,H,D]<->[B,H,N,D] layout transposes
    disappear (they were ~8 ms of the 146 ms ViT-B step). Scores and
    probabilities stay in VMEM as in fused_attention (+18.5% over XLA
    before qkv fusion). CPU (tests) uses the XLA path; set use_pallas=False
    to force XLA everywhere; fuse_qkv=False selects the unfused kernel.
    """

    num_heads: int
    dtype: Dtype = jnp.bfloat16
    use_pallas: bool = True
    fuse_qkv: bool = True

    @nn.compact
    def __call__(self, x, ln_params=None):
        """With ln_params=(scale, bias), computes the FULL pre-norm block
        branch x + proj(attn(LN(x))) — the caller must not re-add the
        residual; on TPU it runs as one fused Pallas kernel per direction.
        Without ln_params, computes proj(attn(x)) as before."""
        B, N, C = x.shape
        head_dim = C // self.num_heads
        dense = partial(nn.Dense, dtype=self.dtype, param_dtype=jnp.float32)
        use_kernel = _pallas_attention_on(self.use_pallas)

        if use_kernel and self.fuse_qkv and ln_params is not None:
            from artgraph_tpu.ops.attention import fused_block_attention

            w, b = _DenseParams(3 * C, name="qkv")(C)
            wp, bp = _DenseParams(C, name="proj")(C)
            gamma, beta = ln_params
            return fused_block_attention(x.astype(self.dtype), gamma, beta,
                                         w, b, wp, bp, self.num_heads)

        residual = None
        if ln_params is not None:
            # unfused fallback with identical semantics (and the same
            # param tree): f32 LN here, residual re-added below
            residual = x
            gamma, beta = ln_params
            acc = at_least_f32(self.dtype)
            xf = x.astype(acc)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
            x = ((xf - mean) * jax.lax.rsqrt(var + 1e-6) * gamma
                 + beta).astype(self.dtype)

        if use_kernel and self.fuse_qkv:
            from artgraph_tpu.ops.attention import fused_qkv_attention

            w, b = _DenseParams(3 * C, name="qkv")(C)
            out = fused_qkv_attention(x.astype(self.dtype), w, b,
                                      self.num_heads)
        else:
            qkv = dense(3 * C, name="qkv")(x)
            qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

            if use_kernel:
                from artgraph_tpu.ops.attention import fused_attention

                out = fused_attention(q, k, v)
            else:
                # Explicit einsum attention (timm's exact computation) rather
                # than jax.nn.dot_product_attention: the latter computes at
                # f32-level precision regardless of input dtype, which leaves
                # ~1e-9 gradient noise on the key-projection bias (whose true
                # gradient is exactly zero — softmax shift invariance). Under
                # the f64 trajectory-parity tests Adam amplifies that noise
                # to full-lr drift. Scores and softmax accumulate in
                # at_least_f32(dtype): the 197-term sums lose ~1e-2 rel in
                # raw bf16 (this path serves the ragged final batch and the
                # auto-sharded jit fallback, so it must match the Pallas
                # kernel's f32 softmax), while f64 stays f64 for parity.
                acc = at_least_f32(self.dtype)
                s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                               preferred_element_type=acc) * (head_dim ** -0.5)
                p = jax.nn.softmax(s, axis=-1)
                out = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(acc),
                                 preferred_element_type=acc)
                out = out.astype(self.dtype)
            out = out.reshape(B, N, C)
        out = dense(C, name="proj")(out)
        if residual is not None:
            return residual + out.astype(residual.dtype)
        return out


class Mlp(nn.Module):
    """timm-style MLP: fc1 -> exact (erf) GELU -> fc2.

    With ln_params=(scale, bias) it computes the FULL pre-norm MLP branch
    x + fc2(gelu(fc1(LN(x)))) — on TPU as one Pallas kernel per direction
    (ops.mlp.fused_block_mlp: the [B, N, 4C] hidden tensor, the GELU output
    and d(hidden) never reach HBM); the caller must not re-add the residual.
    Without ln_params, the plain fc1/gelu/fc2 as before.
    """

    hidden: int
    dtype: Dtype = jnp.bfloat16
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, ln_params=None):
        C = x.shape[-1]
        dense = partial(nn.Dense, dtype=self.dtype, param_dtype=jnp.float32)
        use_kernel = _pallas_attention_on(self.use_pallas)

        if use_kernel and ln_params is not None:
            from artgraph_tpu.ops.mlp import fused_block_mlp

            w1, b1 = _DenseParams(self.hidden, name="fc1")(C)
            w2, b2 = _DenseParams(C, name="fc2")(self.hidden)
            gamma, beta = ln_params
            return fused_block_mlp(x.astype(self.dtype), gamma, beta,
                                   w1, b1, w2, b2)

        residual = None
        if ln_params is not None:
            # unfused fallback with identical semantics (and the same
            # param tree): f32 LN here, residual re-added below
            residual = x
            gamma, beta = ln_params
            acc = at_least_f32(self.dtype)
            xf = x.astype(acc)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
            x = ((xf - mean) * jax.lax.rsqrt(var + 1e-6) * gamma
                 + beta).astype(self.dtype)

        x = dense(self.hidden, name="fc1")(x)
        # timm uses exact (erf) GELU
        x = nn.gelu(x, approximate=False)
        out = dense(C, name="fc2")(x)
        if residual is not None:
            return residual + out.astype(residual.dtype)
        return out


class Block(nn.Module):
    """Pre-norm transformer block (residuals accumulated in f32)."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16
    use_pallas_attention: bool = True
    fuse_qkv: bool = True

    @nn.compact
    def __call__(self, x):
        # Residual stream stays in self.dtype (bf16 by default): +15% step
        # throughput on v5e, and strictly MORE precise than the reference's
        # fp16-autocast residual adds. LayerNorm statistics compute in f32
        # (or wider when the compute dtype is wider — f64 parity tests).
        C = x.shape[-1]
        ln = partial(nn.LayerNorm, epsilon=1e-6,
                     dtype=at_least_f32(self.dtype),
                     param_dtype=jnp.float32)
        attn = Attention(self.num_heads, dtype=self.dtype,
                         use_pallas=self.use_pallas_attention,
                         fuse_qkv=self.fuse_qkv, name="attn")
        mlp = Mlp(int(C * self.mlp_ratio), dtype=self.dtype,
                  use_pallas=self.use_pallas_attention, name="mlp")
        if _pallas_attention_on(self.use_pallas_attention) and self.fuse_qkv:
            # fused block kernels: norm1 + attention + proj + residual add as
            # one pallas_call (ops.attention.fused_block_attention), then
            # norm2 + fc1 + gelu + fc2 + residual add as another
            # (ops.mlp.fused_block_mlp); the norm params are declared here
            # under their usual names/shapes
            x = attn(x, ln_params=_LNParams(name="norm1")(C))
            x = mlp(x, ln_params=_LNParams(name="norm2")(C))
        else:
            x = x + attn(
                ln(name="norm1")(x).astype(self.dtype)).astype(x.dtype)
            x = x + mlp(
                ln(name="norm2")(x).astype(self.dtype)).astype(x.dtype)
        return x


class ViT(nn.Module):
    """Vision transformer trunk. Input NHWC float images."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16
    use_pallas_attention: bool = True
    fuse_qkv: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, pool: bool = True):
        B = x.shape[0]
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="patch_embed")(x.astype(self.dtype))
        x = x.reshape(B, -1, self.embed_dim)  # [B, 196, C]

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim),
            jnp.float32)
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, x.shape[1] + 1, self.embed_dim), jnp.float32)

        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, self.embed_dim)).astype(self.dtype), x],
            axis=1)
        # pos-embed add in f32 (or wider), then the residual stream runs in
        # self.dtype
        x = (x.astype(at_least_f32(self.dtype)) + pos_embed).astype(self.dtype)

        for i in range(self.depth):
            x = Block(self.num_heads, self.mlp_ratio, dtype=self.dtype,
                      use_pallas_attention=self.use_pallas_attention,
                      fuse_qkv=self.fuse_qkv, name=f"block{i}")(x)

        x = nn.LayerNorm(epsilon=1e-6, dtype=at_least_f32(self.dtype),
                         param_dtype=jnp.float32, name="norm")(x)
        if pool:
            # timm-0.4 forward_features contract: CLS token after final norm
            return x[:, 0]
        return x


def vit_base_patch16_224(dtype=jnp.bfloat16) -> ViT:
    return ViT(patch_size=16, embed_dim=768, depth=12, num_heads=12,
               mlp_ratio=4.0, dtype=dtype)
