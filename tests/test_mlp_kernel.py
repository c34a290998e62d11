"""fused_block_mlp (ops/mlp.py) vs the composite XLA MLP block.

The kernel computes x + fc2(gelu_erf(fc1(LayerNorm(x)))) — the pre-norm MLP
branch of a ViT block (ref timm Mlp used by /root/reference/src/models/
models.py:97-123). Interpret mode on CPU; the same kernel compiles under
Mosaic on the chip (verified in the round-4 bench runs).
"""
import jax
import jax.numpy as jnp
import numpy as np

from artgraph_tpu.ops.mlp import fused_block_mlp


def _mlp_ref(x, gamma, beta, w1, b1, w2, b2, eps=1e-6):
    """Composite reference: f32 LN statistics, dtype-matched matmul casts,
    exact (erf) GELU — the Mlp module's unfused fallback semantics."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean,
                      0.0)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)
    h = y @ w1.astype(x.dtype) + b1.astype(x.dtype)
    act = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    out = act @ w2.astype(x.dtype) + b2.astype(x.dtype)
    return x + out.astype(x.dtype)


def _inputs(B=2, N=197, C=128, Hd=512, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    w1 = jnp.asarray((rng.normal(size=(C, Hd)) / np.sqrt(C)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(Hd,)).astype(np.float32) * 0.02)
    w2 = jnp.asarray((rng.normal(size=(Hd, C)) / np.sqrt(Hd)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.02)
    return x, gamma, beta, w1, b1, w2, b2


def test_mlp_fused_forward_matches_composite():
    args = _inputs()
    ref = _mlp_ref(*args)
    out = fused_block_mlp(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_mlp_fused_gradients_match_composite():
    args = _inputs(B=3, N=64, C=96, Hd=384, seed=1)
    argnums = tuple(range(7))

    def loss(f):
        return lambda *a: jnp.sum(jnp.sin(f(*a)))

    g_ref = jax.grad(loss(_mlp_ref), argnums=argnums)(*args)
    g_out = jax.grad(loss(fused_block_mlp), argnums=argnums)(*args)
    names = ("dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2")
    for name, a, b_ in zip(names, g_ref, g_out):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_mlp_fused_bf16_vit_geometry():
    """Production geometry (bf16 x, f32 params, N=197, C=768, Hd=3072) at a
    reduced batch, fwd + grads."""
    x, gamma, beta, w1, b1, w2, b2 = _inputs(B=2, N=197, C=768, Hd=3072,
                                             seed=2)
    xb = x.astype(jnp.bfloat16)
    out = fused_block_mlp(xb, gamma, beta, w1, b1, w2, b2)
    assert out.dtype == jnp.bfloat16
    ref = _mlp_ref(xb, gamma, beta, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)

    def loss(f):
        return lambda *a: jnp.sum(jnp.sin(f(*a).astype(jnp.float32)))

    argnums = tuple(range(7))
    g_ref = jax.grad(loss(_mlp_ref), argnums=argnums)(xb, gamma, beta,
                                                      w1, b1, w2, b2)
    g_out = jax.grad(loss(fused_block_mlp), argnums=argnums)(xb, gamma, beta,
                                                             w1, b1, w2, b2)
    names = ("dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2")
    for name, a, b_ in zip(names, g_ref, g_out):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        scale = np.abs(a).mean() + 1e-6
        # worst-element-vs-mean-magnitude over bf16 grads (the composite's
        # own bf16 rounding differs per op order) — same bound as the fused
        # attention block's bf16 test
        assert np.max(np.abs(a - b_)) / scale < 0.2, (
            f"{name}: {np.max(np.abs(a - b_)) / scale}")


def test_mlp_module_ln_params_fallback_matches_plain():
    """Mlp(x, ln_params=...) on CPU (unfused fallback) == LN + Mlp(x) +
    residual composed from the plain modules, and the param tree is
    unchanged by the fused-capable call signature."""
    from flax.core import unfreeze

    from artgraph_tpu.models.vit import Mlp

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 9, 32), jnp.float32)
    gamma = jnp.ones((32,), jnp.float32) * 1.1
    beta = jnp.ones((32,), jnp.float32) * 0.05
    mlp = Mlp(64, dtype=jnp.float32)
    v = mlp.init(rng, x)
    v2 = mlp.init(rng, x, ln_params=(gamma, beta))
    t1 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), unfreeze(v))
    t2 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), unfreeze(v2))
    assert t1 == t2

    got = mlp.apply(v, x, ln_params=(gamma, beta))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean,
                      0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-6) * gamma + beta
    want = x + mlp.apply(v, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
