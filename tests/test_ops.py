"""Device preprocessing ops: Pallas and XLA paths must agree bit-exactly with
the reference's host-side normalize."""
import numpy as np
import jax.numpy as jnp

from artgraph_tpu.data.transforms import host_normalize
from artgraph_tpu.ops import normalize_images, normalize_images_pallas


def _images(shape=(4, 224, 224, 3), seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def test_normalize_matches_host_reference():
    x = _images()
    for transform in ("resnet", "vit"):
        dev = np.asarray(normalize_images(jnp.asarray(x), transform))
        host = host_normalize(x, transform)
        np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-6)


def test_pallas_matches_xla():
    x = _images(seed=1)
    a = np.asarray(normalize_images(jnp.asarray(x), "resnet"))
    b = np.asarray(normalize_images_pallas(jnp.asarray(x), "resnet"))
    # bit-exact on TPU; interpret mode (CPU tests) differs by 1 ulp
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_pallas_fallback_on_unaligned_shape():
    x = _images(shape=(2, 50, 50, 3), seed=2)  # 7500 % 384 != 0 -> XLA path
    a = np.asarray(normalize_images(jnp.asarray(x), "vit"))
    b = np.asarray(normalize_images_pallas(jnp.asarray(x), "vit"))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
