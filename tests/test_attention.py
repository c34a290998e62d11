"""Fused Pallas attention vs jax.nn.dot_product_attention (interpret mode on
CPU; bit-level agreement is checked on TPU in the drive scripts)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artgraph_tpu.ops.attention import (fused_attention,
                                        fused_block_attention,
                                        fused_qkv_attention)


def _qkv(B=2, N=197, H=4, D=64, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
                 for _ in range(3))


def test_forward_matches_xla():
    q, k, v = _qkv()
    ref = jax.nn.dot_product_attention(q, k, v)
    out = fused_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_gradients_match_xla():
    q, k, v = _qkv(B=1, N=64, H=2, D=64, seed=1)

    def loss(f):
        return lambda q, k, v: jnp.sum(jnp.sin(f(q, k, v)))

    g_ref = jax.grad(loss(jax.nn.dot_product_attention), argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss(fused_attention), argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_ref, g_out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d{name}")


def test_padding_mask_correct():
    """N=197 pads to 256 internally; padded key columns must not leak."""
    q, k, v = _qkv(B=1, N=197, H=1, D=64, seed=2)
    out = fused_attention(q, k, v)
    assert out.shape == (1, 197, 1, 64)
    # equivalent unpadded-by-construction reference
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def _qkv_ref(x, w, b, H):
    """Composite XLA reference: Dense(3C) qkv -> dot_product_attention."""
    B, N, C = x.shape
    D = C // H
    qkv = (x @ w + b).reshape(B, N, 3, H, D)
    out = jax.nn.dot_product_attention(qkv[:, :, 0], qkv[:, :, 1],
                                       qkv[:, :, 2])
    return out.reshape(B, N, C)


def _qkv_inputs(B=2, N=197, C=256, H=4, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(C, 3 * C)) / np.sqrt(C))
                    .astype(np.float32))
    b = jnp.asarray(rng.normal(size=(3 * C,)).astype(np.float32) * 0.02)
    return x, w, b


def test_qkv_fused_forward_matches_composite():
    x, w, b = _qkv_inputs()
    ref = _qkv_ref(x, w, b, 4)
    out = fused_qkv_attention(x, w, b, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_qkv_fused_gradients_match_composite():
    x, w, b = _qkv_inputs(B=2, N=64, C=128, H=2, seed=1)

    def loss(f):
        return lambda x, w, b: jnp.sum(jnp.sin(f(x, w, b)))

    g_ref = jax.grad(loss(lambda x, w, b: _qkv_ref(x, w, b, 2)),
                     argnums=(0, 1, 2))(x, w, b)
    g_out = jax.grad(loss(lambda x, w, b: fused_qkv_attention(x, w, b, 2)),
                     argnums=(0, 1, 2))(x, w, b)
    for name, a, b_ in zip(("dx", "dw", "db"), g_ref, g_out):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_qkv_fused_bf16_gradients():
    """Production ViT training runs the backward kernel in bf16 only —
    pin the bf16 grad path (loose tolerance, bf16 resolution)."""
    x, w, b = _qkv_inputs(B=2, N=64, C=128, H=2, seed=3)
    xb = x.astype(jnp.bfloat16)

    def loss(f):
        return lambda x, w, b: jnp.sum(jnp.sin(
            f(x, w, b).astype(jnp.float32)))

    g_ref = jax.grad(loss(lambda x, w, b: _qkv_ref(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16), 2)), argnums=(0, 1, 2))(xb, w, b)
    g_out = jax.grad(loss(lambda x, w, b: fused_qkv_attention(x, w, b, 2)),
                     argnums=(0, 1, 2))(xb, w, b)
    for name, a, b_ in zip(("dx", "dw", "db"), g_ref, g_out):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        scale = np.abs(a).mean() + 1e-6
        assert np.max(np.abs(a - b_)) / scale < 0.15, name


def test_qkv_fused_bf16_vit_geometry():
    """The production geometry (bf16, N=197, H=12) at a reduced batch."""
    x, w, b = _qkv_inputs(B=2, N=197, C=768, H=12, seed=2)
    xb = x.astype(jnp.bfloat16)
    ref = _qkv_ref(xb, w.astype(jnp.bfloat16), b.astype(jnp.bfloat16), 12)
    out = fused_qkv_attention(xb, w, b, 12)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def _block_ref(x, gamma, beta, w, b, wp, bp, H, eps=1e-6):
    """Composite XLA reference for the fused block kernel:
    x + proj(attention(LayerNorm(x))) with f32 LN statistics."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean,
                      0.0)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)
    attn = _qkv_ref(y, w.astype(x.dtype), b.astype(x.dtype), H)
    p = (attn @ wp.astype(x.dtype) + bp.astype(x.dtype))
    return x + p.astype(x.dtype)


def _block_inputs(B=2, N=197, C=256, H=4, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(C, 3 * C)) / np.sqrt(C))
                    .astype(np.float32))
    b = jnp.asarray(rng.normal(size=(3 * C,)).astype(np.float32) * 0.02)
    wp = jnp.asarray((rng.normal(size=(C, C)) / np.sqrt(C)).astype(np.float32))
    bp = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.02)
    return x, gamma, beta, w, b, wp, bp


def test_block_fused_forward_matches_composite():
    args = _block_inputs()
    ref = _block_ref(*args, 4)
    out = fused_block_attention(*args, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_block_fused_gradients_match_composite():
    args = _block_inputs(B=3, N=64, C=128, H=2, seed=1)
    argnums = tuple(range(7))

    def loss(f):
        return lambda *a: jnp.sum(jnp.sin(f(*a, 2)))

    g_ref = jax.grad(loss(_block_ref), argnums=argnums)(*args)
    g_out = jax.grad(loss(fused_block_attention), argnums=argnums)(*args)
    names = ("dx", "dgamma", "dbeta", "dw_qkv", "db_qkv", "dw_proj", "db_proj")
    for name, a, b_ in zip(names, g_ref, g_out):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_block_fused_bf16_vit_geometry():
    """Production geometry (bf16 x, f32 params, N=197, H=12), fwd + grads."""
    x, gamma, beta, w, b, wp, bp = _block_inputs(B=2, N=197, C=768, H=12,
                                                 seed=2)
    xb = x.astype(jnp.bfloat16)
    out = fused_block_attention(xb, gamma, beta, w, b, wp, bp, 12)
    assert out.dtype == jnp.bfloat16
    ref = _block_ref(xb, gamma, beta, w, b, wp, bp, 12)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)

    def loss(f):
        return lambda *a: jnp.sum(jnp.sin(f(*a, 12).astype(jnp.float32)))

    argnums = tuple(range(7))
    g_ref = jax.grad(loss(_block_ref), argnums=argnums)(xb, gamma, beta, w,
                                                        b, wp, bp)
    g_out = jax.grad(loss(fused_block_attention),
                     argnums=argnums)(xb, gamma, beta, w, b, wp, bp)
    names = ("dx", "dgamma", "dbeta", "dw_qkv", "db_qkv", "dw_proj", "db_proj")
    for name, a, b_ in zip(names, g_ref, g_out):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        scale = np.abs(a).mean() + 1e-6
        # 0.2: worst-element-vs-mean-magnitude over 1.7M-element bf16 grads
        # (the reference composition's own bf16 rounding differs per op order)
        assert np.max(np.abs(a - b_)) / scale < 0.2, (
            f"{name}: {np.max(np.abs(a - b_)) / scale}")


def test_custom_scale():
    q, k, v = _qkv(B=1, N=64, H=1, D=64, seed=3)
    out = fused_attention(q, k, v, 0.5)
    ref = jax.nn.dot_product_attention(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
