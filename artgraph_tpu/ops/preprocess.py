"""Fused on-device image preprocessing (uint8 -> normalized float).

Replaces the host-side ToTensor+Normalize of the reference pipeline
(ref: src/data/data.py:11-27) per the north star: batches travel to HBM as
uint8 NHWC (4x smaller transfers), and (x/255 - mean)/std runs on device.

Two implementations:
  * `normalize_images` — jnp ops; inside a jitted train step XLA fuses this
    into the first convolution's input, which is usually optimal.
  * `normalize_images_pallas` — a Pallas VPU kernel that performs the fused
    u8->f32 normalize with a precomputed scale/shift ((x*alpha + beta) form,
    one multiply-add per element) over lane-aligned flat blocks. Useful when
    preprocessing is run standalone (e.g. the projection generator) rather
    than fused into a model step.

Both produce bit-identical f32 results (tested in tests/test_ops.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from artgraph_tpu import config


def _stats(transform_type: str):
    mean, std = config.NORM_STATS[transform_type]
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    # (u8/255 - mean)/std  ==  u8 * alpha + beta
    alpha = 1.0 / (255.0 * std)
    beta = -mean / std
    return alpha, beta


def normalize_images(images_u8: jnp.ndarray,
                     transform_type: str = "resnet") -> jnp.ndarray:
    """uint8 NHWC -> f32 NHWC, XLA-fused path."""
    alpha, beta = _stats(transform_type)
    return images_u8.astype(jnp.float32) * alpha + beta


def _normalize_kernel(img_ref, alpha_ref, beta_ref, out_ref):
    # Block layout: [ROW_TILE, 384] where 384 = 3 channels * 128 lanes; the
    # RGB channel pattern repeats every 3 lane positions, so a per-lane
    # [1, 384] alpha/beta vector broadcasts the channel stats correctly.
    # Mosaic has no direct u8->f32 cast; widen through i32 first.
    block = img_ref[:].astype(jnp.int32).astype(jnp.float32)
    out_ref[:] = block * alpha_ref[:] + beta_ref[:]


@functools.partial(jax.jit, static_argnames=("transform_type",))
def normalize_images_pallas(images_u8: jnp.ndarray,
                            transform_type: str = "resnet") -> jnp.ndarray:
    """uint8 NHWC -> f32 NHWC via a fused Pallas VPU kernel.

    Requires H*W*3 divisible by 384 (true for 224x224x3 = 392 * 384);
    falls back to the XLA path otherwise.
    """
    B, H, W, C = images_u8.shape
    flat = H * W * C
    LANES = 384  # 3 channels * 128 lanes: channel pattern repeats per row
    if C != 3 or flat % LANES != 0:
        return normalize_images(images_u8, transform_type)

    alpha, beta = _stats(transform_type)
    alpha_row = jnp.tile(alpha, LANES // 3).reshape(1, LANES)
    beta_row = jnp.tile(beta, LANES // 3).reshape(1, LANES)

    rows = B * flat // LANES
    x = images_u8.reshape(rows, LANES)
    ROW_TILE = 256
    interpret = jax.devices()[0].platform == "cpu"

    out = pl.pallas_call(
        _normalize_kernel,
        grid=(pl.cdiv(rows, ROW_TILE),),
        in_specs=[
            pl.BlockSpec((ROW_TILE, LANES), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, LANES), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=interpret,
    )(x, alpha_row, beta_row)
    return out.reshape(B, H, W, C)
