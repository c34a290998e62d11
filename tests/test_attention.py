"""Fused Pallas attention vs jax.nn.dot_product_attention (interpret mode on
CPU; bit-level agreement is checked on TPU in the drive scripts)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artgraph_tpu.ops.attention import fused_attention


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


def test_custom_scale():
    q, k, v = _qkv(B=1, N=64, H=1, D=64, seed=3)
    out = fused_attention(q, k, v, 0.5)
    ref = jax.nn.dot_product_attention(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
