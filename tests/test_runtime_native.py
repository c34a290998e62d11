"""Native C++ decode/resize runtime: bit-exact parity with PIL."""
import numpy as np
import pytest
from PIL import Image

from artgraph_tpu.runtime import (
    decode_batch_native,
    decode_resize_native,
    native_available,
)
from artgraph_tpu.runtime.image_cpp import resize_native

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native runtime not built")


def test_resize_bit_exact_vs_pil():
    rng = np.random.default_rng(0)
    for h, w in ((60, 80), (224, 224), (500, 300), (37, 991)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        pil = np.asarray(Image.fromarray(img).resize((224, 224), Image.BILINEAR))
        ours = resize_native(img, 224)
        np.testing.assert_array_equal(ours, pil, err_msg=f"{h}x{w}")


def test_decode_resize_bit_exact_vs_pil(tmp_path):
    rng = np.random.default_rng(1)
    path = str(tmp_path / "t.jpg")
    Image.fromarray(rng.integers(0, 256, (123, 217, 3), dtype=np.uint8)).save(
        path, quality=90)
    pil = np.asarray(Image.open(path).convert("RGB").resize(
        (224, 224), Image.BILINEAR))
    ours = decode_resize_native(path, 224)
    np.testing.assert_array_equal(ours, pil)


def test_grayscale_jpeg_matches_pil_rgb_convert(tmp_path):
    rng = np.random.default_rng(2)
    path = str(tmp_path / "g.jpg")
    Image.fromarray(rng.integers(0, 256, (90, 120), dtype=np.uint8),
                    mode="L").save(path)
    pil = np.asarray(Image.open(path).convert("RGB").resize(
        (224, 224), Image.BILINEAR))
    ours = decode_resize_native(path, 224)
    np.testing.assert_array_equal(ours, pil)


def test_png_falls_back_to_none(tmp_path):
    path = str(tmp_path / "p.png")
    Image.fromarray(np.zeros((20, 20, 3), np.uint8)).save(path)
    assert decode_resize_native(path, 224) is None


def test_decode_batch(tmp_path):
    rng = np.random.default_rng(3)
    paths = []
    for i in range(5):
        p = str(tmp_path / f"{i}.jpg")
        Image.fromarray(rng.integers(0, 256, (64 + i, 80, 3),
                                     dtype=np.uint8)).save(p, quality=92)
        paths.append(p)
    paths.append(str(tmp_path / "missing.jpg"))
    batch, status = decode_batch_native(paths, 224, threads=2)
    assert batch.shape == (6, 224, 224, 3)
    assert list(status[:5]) == [0] * 5 and status[5] != 0
    for i, p in enumerate(paths[:5]):
        pil = np.asarray(Image.open(p).convert("RGB").resize(
            (224, 224), Image.BILINEAR))
        np.testing.assert_array_equal(batch[i], pil)
