"""Image preprocessing, split TPU-first into a host half and a device half.

Reference behavior being reproduced (ref: src/data/data.py:11-49):
  PIL open -> RGB convert -> Resize((224,224)) bilinear -> ToTensor (u8/255)
  -> Normalize(mean, std)  [ImageNet stats for resnet, 0.5/0.5 for vit]

TPU-first split:
  * HOST   — decode + bilinear resize to 224x224 **uint8 HWC** (4x less
    PCIe/ICI traffic than f32, and JPEG decode is inherently host work).
    PIL is numerics-identical to the reference's torchvision Resize (which
    delegates to PIL for PIL inputs). A native C++ decode path lives in
    artgraph_tpu.runtime and is used by the loader when built.
  * DEVICE — fused (u8 -> f32/255 -> (x-mean)/std) normalize, done inside the
    jitted train step so XLA fuses it with the first convolution; a Pallas
    kernel variant lives in artgraph_tpu.ops.preprocess.

Truncated-JPEG tolerance mirrors ref: src/data/data.py:9
(ImageFile.LOAD_TRUNCATED_IMAGES = True).
"""
from __future__ import annotations

import numpy as np
from PIL import Image, ImageFile

from artgraph_tpu import config

ImageFile.LOAD_TRUNCATED_IMAGES = True


def decode_resize_uint8(image_path: str, size: int = config.IMAGE_SIZE) -> np.ndarray:
    """Host half: open, force RGB, bilinear-resize. Returns uint8 [H, W, 3].

    Matches ref src/data/data.py:38-49 `prepare_image` up to (but excluding)
    ToTensor/Normalize, which run on device.

    Fast path: the native C++ runtime (libjpeg decode + PIL-bit-exact
    resampling, artgraph_tpu.runtime) handles RGB JPEGs; PIL covers
    everything else (PNG, CMYK/greyscale JPEG, truncated files).
    """
    from artgraph_tpu.runtime import decode_resize_native

    native = decode_resize_native(image_path, size)
    if native is not None:
        return native
    image = Image.open(image_path)
    if image.mode != "RGB":
        image = image.convert("RGB")
    image = image.resize((size, size), Image.BILINEAR)
    return np.asarray(image, dtype=np.uint8)


def normalize_stats(transform_type: str):
    """(mean, std) tuples for 'resnet' | 'vit' (ref: src/data/data.py:11-27)."""
    if transform_type not in config.NORM_STATS:
        raise ValueError(f"unknown transform_type: {transform_type!r}")
    mean, std = config.NORM_STATS[transform_type]
    return (
        np.asarray(mean, dtype=np.float32),
        np.asarray(std, dtype=np.float32),
    )


def host_normalize(images_u8: np.ndarray, transform_type: str = "resnet") -> np.ndarray:
    """Reference-parity normalize on host (for tests / CPU-only paths).

    images_u8: uint8 [..., H, W, 3]  ->  float32 [..., H, W, 3]
    """
    mean, std = normalize_stats(transform_type)
    return (images_u8.astype(np.float32) / 255.0 - mean) / std


def transform(image_path: str) -> np.ndarray:
    """Full host-side resnet transform (decode + resize + normalize), NHWC f32.

    Numerics-equivalent to ref src/data/data.py:11-18 `transform` (which emits
    CHW; we use NHWC — the TPU-native layout).
    """
    return host_normalize(decode_resize_uint8(image_path), "resnet")


def vit_transform(image_path: str) -> np.ndarray:
    """Full host-side vit transform (ref: src/data/data.py:20-27), NHWC f32."""
    return host_normalize(decode_resize_uint8(image_path), "vit")
