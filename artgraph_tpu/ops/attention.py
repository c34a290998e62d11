"""Fused multi-head attention for short sequences (ViT-B/16: N=197).

XLA's attention materializes the [B, H, N, N] score/probability tensors in
HBM (≈120 MB per direction per layer at B=128); at N=197 the whole
per-(batch, head-block) problem fits VMEM instead. Measured on v5e at the
ViT-B geometry (B=128, N=197, H=12, D=64), INCLUDING the layout transposes
from the model's natural [B, N, H, D]: 1.32 ms vs XLA's 2.72 ms per layer
forward. The backward kernel recomputes probabilities (flash-style) and
emits dq/dk/dv in one pass.

Key TPU detail: NO sequence padding. Pallas allows a block dimension equal
to the full (unaligned) array dimension — padding 197 -> 256 on every
operand costs more than Mosaic's internal handling of the odd size, and
killing it removed the wrapper overhead entirely. Heads are tiled in blocks
(HB) to bound the [HB, N, N] f32 score tensors within VMEM.

Numerics: inputs bf16 (or f32), contractions with f32 accumulation; matches
jax.nn.dot_product_attention to bf16 resolution (tests/test_attention.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    """Interpret kernels off-TPU (CPU tests); compiled Mosaic on device."""
    return jax.devices()[0].platform == "cpu"


def _flat(ref):
    """[BB, HB, N, D] block -> [BB*HB, N, D] (batched-dot geometry)."""
    bb, hb, n, d = ref.shape
    return ref[...].reshape(bb * hb, n, d)


def _fwd_kernel(scale: float, q_ref, k_ref, v_ref, o_ref):
    # contractions take the inputs in their storage dtype (bf16) with f32
    # accumulation — full MXU rate; only softmax math runs in f32. An f32
    # upcast before the dots costs 3x MXU passes for precision the bf16
    # inputs never had.
    q = _flat(q_ref)  # [BB*HB, N, D]
    k = _flat(k_ref)
    v = _flat(v_ref)

    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(q.dtype), v,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) / l
    o_ref[...] = o.astype(o_ref.dtype).reshape(o_ref.shape)


def _bwd_kernel(scale: float, q_ref, k_ref, v_ref, o_ref, do_ref,
                dq_ref, dk_ref, dv_ref):
    # same dtype policy as forward: bf16 contractions / f32 accumulation +
    # f32 softmax math
    q = _flat(q_ref)  # [BB*HB, N, D]
    k = _flat(k_ref)
    v = _flat(v_ref)
    o = _flat(o_ref)
    do = _flat(do_ref)

    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / l).astype(q.dtype)  # softmax probabilities [HB, N, N]

    dv = jax.lax.dot_general(p, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    d_row = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)
    ds = (p.astype(jnp.float32) * (dp - d_row) * scale).astype(q.dtype)

    dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dq_ref[...] = dq.astype(dq_ref.dtype).reshape(dq_ref.shape)
    dk_ref[...] = dk.astype(dk_ref.dtype).reshape(dk_ref.shape)
    dv_ref[...] = dv.astype(dv_ref.dtype).reshape(dv_ref.shape)


def _specs(BB: int, HB: int, N: int, D: int):
    # [B, H, N, D] with block (BB, HB, N, D): the last two dims equal the
    # full array dims, which Pallas accepts unaligned — no sequence padding.
    # BB batches per grid step amortize per-step dispatch/pipeline overhead
    # (B=128 single-image steps were the bottleneck, not the matmuls).
    return pl.BlockSpec((BB, HB, N, D), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)


def _blocks(B: int, H: int, N: int, n_out: int):
    """(BB, HB) keeping the [BB*HB, N, N] f32 score tensors ~6 MB."""
    limit = max(1, (6 * 1024 * 1024) // (N * N * 4 * (2 if n_out == 1 else 3)))
    hb = 1
    for cand in range(min(H, limit), 0, -1):
        if H % cand == 0:
            hb = cand
            break
    bb = 1
    while bb * 2 <= B and (bb * 2) * hb <= limit and B % (bb * 2) == 0:
        bb *= 2
    return bb, hb


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, scale=None):
    """softmax(q k^T * scale) v with [B, N, H, D] inputs."""
    out, _ = _fused_attention_fwd(q, k, v, scale)
    return out


def _call(kernel, n_out, q, k, v, extras=()):
    B, N, H, D = q.shape
    interpret = _use_interpret()
    BB, HB = _blocks(B, H, N, n_out)
    inputs = [jnp.transpose(x, (0, 2, 1, 3)) for x in (q, k, v, *extras)]
    out_shapes = [jax.ShapeDtypeStruct((B, H, N, D), q.dtype)] * n_out
    spec = _specs(BB, HB, N, D)
    outs = pl.pallas_call(
        kernel,
        grid=(B // BB, H // HB),
        in_specs=[spec] * len(inputs),
        out_specs=[spec] * n_out if n_out > 1 else spec,
        out_shape=out_shapes if n_out > 1 else out_shapes[0],
        interpret=interpret,
    )(*inputs)
    outs = outs if n_out > 1 else (outs,)
    return tuple(jnp.transpose(o, (0, 2, 1, 3)) for o in outs)


def _fused_attention_fwd(q, k, v, scale):
    D = q.shape[3]
    scale_val = (D ** -0.5) if scale is None else scale
    kernel = functools.partial(_fwd_kernel, scale_val)
    (out,) = _call(kernel, 1, q, k, v)
    return out, (q, k, v, out)


def _fused_attention_bwd(scale, residuals, d_out):
    q, k, v, out = residuals
    D = q.shape[3]
    scale_val = (D ** -0.5) if scale is None else scale
    kernel = functools.partial(_bwd_kernel, scale_val)
    dq, dk, dv = _call(kernel, 3, q, k, v, extras=(out, d_out))
    return dq, dk, dv


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


# ---------------------------------------------------------------------------
# qkv-fused attention: the qkv projection runs INSIDE the kernel.
#
# XLA's qkv path writes the [B, N, 3C] projection to HBM (~116 MB at the
# ViT-B geometry), reads it back for the [B,N,H,D]->[B,H,N,D] layout
# transposes, and reads it a third time in the attention kernel. Fusing the
# projection removes that round-trip entirely: per grid step the kernel
# reads an x block once, computes qkv on the MXU, splits heads in VMEM,
# runs the same flash-style attention as `fused_attention`, and writes the
# [BB, N, C] output block once. The backward kernel recomputes qkv +
# probabilities and emits d(qkv); the dx/dw/db closures are single XLA
# matmuls (dw needs a cross-batch reduction XLA already does at full MXU
# rate, so it stays outside the kernel).
#
# Residuals are (x, w, b, out): 2 x 39 MB at ViT-B/128 vs 4 x 39 MB for the
# transposed q/k/v/out the unfused path saves.
# ---------------------------------------------------------------------------


def _qkv_fwd_kernel(scale: float, H: int, x_ref, w_ref, b_ref, o_ref):
    # Mosaic rejects the (N, 3C) -> (N, 3, H, D) shape cast (lane-dim split),
    # so heads are separated with 2-D column slices in a statically unrolled
    # loop — no reshapes or transposes touch the lane dim.
    _, N, C = x_ref.shape
    D = C // H
    x = x_ref[...].reshape(N, C)
    qkv = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[...].astype(jnp.float32)).astype(x.dtype)
    outs = []
    for h in range(H):
        q = qkv[:, h * D:(h + 1) * D]                  # [N, D]
        k = qkv[:, C + h * D:C + (h + 1) * D]
        v = qkv[:, 2 * C + h * D:2 * C + (h + 1) * D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(x.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / l
        outs.append(o.astype(o_ref.dtype))
    o_ref[...] = jnp.concatenate(outs, axis=-1).reshape(o_ref.shape)


def _qkv_bwd_kernel(scale: float, H: int, x_ref, w_ref, b_ref, o_ref, do_ref,
                    dqkv_ref):
    _, N, C = x_ref.shape
    D = C // H
    x = x_ref[...].reshape(N, C)
    o_full = o_ref[...].reshape(N, C)
    do_full = do_ref[...].reshape(N, C)
    qkv = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[...].astype(jnp.float32)).astype(x.dtype)
    dqs, dks, dvs = [], [], []
    for h in range(H):
        q = qkv[:, h * D:(h + 1) * D]                  # [N, D]
        k = qkv[:, C + h * D:C + (h + 1) * D]
        v = qkv[:, 2 * C + h * D:2 * C + (h + 1) * D]
        o = o_full[:, h * D:(h + 1) * D]
        do = do_full[:, h * D:(h + 1) * D]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        p = (e / l).astype(x.dtype)

        dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        d_row = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
        ds = (p.astype(jnp.float32) * (dp - d_row) * scale).astype(x.dtype)

        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dqs.append(dq.astype(dqkv_ref.dtype))
        dks.append(dk.astype(dqkv_ref.dtype))
        dvs.append(dv.astype(dqkv_ref.dtype))
    dqkv_ref[...] = jnp.concatenate(dqs + dks + dvs, axis=-1) \
        .reshape(dqkv_ref.shape)


def _qkv_call(kernel, x, w, b, extras, out_dim):
    B, N, C = x.shape
    BB = 1  # one image per grid step; all H heads processed per step
    interpret = _use_interpret()
    xspec = pl.BlockSpec((BB, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((BB, N, out_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // BB,),
        in_specs=[xspec, wspec, bspec] + [xspec] * len(extras),
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, N, out_dim), x.dtype),
        interpret=interpret,
    )(x, w, b, *extras)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_qkv_attention(x, w, b, num_heads, scale=None):
    """softmax((x W_q + b_q)(x W_k + b_k)^T * scale)(x W_v + b_v), merged.

    x: [B, N, C] activations (bf16); w: [C, 3C] fused qkv kernel; b: [3C]
    bias (timm Dense(3C) layout: columns ordered (qkv-slot, head, dim)).
    Returns [B, N, C] with heads re-merged, ready for the output projection.
    """
    out, _ = _fused_qkv_fwd(x, w, b, num_heads, scale)
    return out


def _fused_qkv_fwd(x, w, b, num_heads, scale):
    B, N, C = x.shape
    D = C // num_heads
    scale_val = (D ** -0.5) if scale is None else scale
    wc = w.astype(x.dtype)
    bc = b.astype(x.dtype).reshape(1, -1)
    kernel = functools.partial(_qkv_fwd_kernel, scale_val, num_heads)
    out = _qkv_call(kernel, x, wc, bc, (), C)
    return out, (x, wc, bc, out)


def _fused_qkv_bwd(num_heads, scale, residuals, d_out):
    x, wc, bc, out = residuals
    B, N, C = x.shape
    D = C // num_heads
    scale_val = (D ** -0.5) if scale is None else scale
    kernel = functools.partial(_qkv_bwd_kernel, scale_val, num_heads)
    dqkv = _qkv_call(kernel, x, wc, bc, (out, d_out), 3 * C)
    # dx/dw/db are plain dense contractions; XLA runs them at full MXU rate
    # (dw's cross-batch reduction in particular), so they stay outside.
    dx = jax.lax.dot_general(
        dqkv, wc, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    dw = jax.lax.dot_general(
        x.reshape(B * N, C), dqkv.reshape(B * N, 3 * C),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db = jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1))
    return dx, dw, db


fused_qkv_attention.defvjp(_fused_qkv_fwd, _fused_qkv_bwd)


# ---------------------------------------------------------------------------
# Fully fused transformer attention block:
#
#     out = x + proj(attention(LayerNorm(x)))
#
# One kernel per direction. The forward reads the residual-stream block x
# ONCE, computes the f32 LayerNorm, the qkv projection, per-head flash
# attention, the output projection and the residual add in VMEM, and writes
# the new residual block once — the LN output, the [B,N,3C] qkv tensor, and
# the attention output never exist in HBM (5 intermediate HBM round-trips in
# the unfused path). The backward recomputes everything from the SAME saved
# x (residuals are x + params only), emits dx in one pass, and accumulates
# all six parameter gradients (d_wqkv, d_bqkv, d_wproj, d_bproj, d_gamma,
# d_beta) in VMEM across the sequential grid — the [B,N,3C] d(qkv) tensor
# also never reaches HBM, unlike fused_qkv_attention's backward.
#
# LayerNorm statistics and normalization run in f32 (the model's policy);
# contractions take bf16 inputs with f32 accumulation as everywhere else.
# ---------------------------------------------------------------------------


def _ln_rows(x_f32, eps: float):
    """flax-style LN row statistics: uncentered variance, clipped at 0."""
    mean = jnp.mean(x_f32, axis=-1, keepdims=True)
    mean2 = jnp.mean(x_f32 * x_f32, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x_f32 - mean) * rstd
    return xhat, rstd


def _head_attention(qkv, h: int, C: int, D: int, scale: float):
    """One head's probabilities + f32 output from the fused qkv tensor."""
    q = qkv[:, h * D:(h + 1) * D]
    k = qkv[:, C + h * D:C + (h + 1) * D]
    v = qkv[:, 2 * C + h * D:2 * C + (h + 1) * D]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / l).astype(qkv.dtype)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return p, o, q, k, v


def _block_fwd_kernel(scale: float, H: int, eps: float, x_ref, g_ref, bl_ref,
                      wq_ref, bq_ref, wp_ref, bp_ref, o_ref):
    _, N, C = x_ref.shape
    D = C // H
    x = x_ref[...].reshape(N, C)
    xhat, _ = _ln_rows(x.astype(jnp.float32), eps)
    y = (xhat * g_ref[...] + bl_ref[...]).astype(x.dtype)

    qkv = jnp.dot(y, wq_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bq_ref[...].astype(jnp.float32)).astype(x.dtype)
    outs = []
    for h in range(H):
        _, o, _, _, _ = _head_attention(qkv, h, C, D, scale)
        outs.append(o.astype(x.dtype))
    attn = jnp.concatenate(outs, axis=-1)            # [N, C]
    p = jnp.dot(attn, wp_ref[...], preferred_element_type=jnp.float32)
    p = (p + bp_ref[...].astype(jnp.float32)).astype(x.dtype)
    o_ref[...] = (x + p).reshape(o_ref.shape)


def _block_bwd_kernel(scale: float, H: int, eps: float, x_ref, g_ref, bl_ref,
                      wq_ref, bq_ref, wp_ref, do_ref, dx_ref, dwq_ref,
                      dbq_ref, dwp_ref, dbp_ref, dg_ref, dbl_ref):
    _, N, C = x_ref.shape
    D = C // H
    x = x_ref[...].reshape(N, C)
    do_final = do_ref[...].reshape(N, C)

    # recompute forward up to the attention outputs
    xf = x.astype(jnp.float32)
    xhat, rstd = _ln_rows(xf, eps)
    gamma = g_ref[...]
    y = (xhat * gamma + bl_ref[...]).astype(x.dtype)
    qkv = jnp.dot(y, wq_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bq_ref[...].astype(jnp.float32)).astype(x.dtype)

    heads = [_head_attention(qkv, h, C, D, scale) for h in range(H)]
    attn = jnp.concatenate([o.astype(x.dtype) for _, o, _, _, _ in heads],
                           axis=-1)                  # [N, C]

    # proj backward: p = attn @ wp + bp ; out = x + p  =>  dp == do_final
    do_attn = jax.lax.dot_general(
        do_final, wp_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)

    # per-head attention backward -> d(qkv)
    dqs, dks, dvs = [], [], []
    for h, (p, o, q, k, v) in enumerate(heads):
        do = do_attn[:, h * D:(h + 1) * D]
        dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        d_row = jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)
        ds = (p.astype(jnp.float32) * (dp - d_row) * scale).astype(x.dtype)
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dqs.append(dq.astype(x.dtype))
        dks.append(dk.astype(x.dtype))
        dvs.append(dv.astype(x.dtype))
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # [N, 3C]

    # qkv-projection backward
    dy = jax.lax.dot_general(dqkv, wq_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [N, C] f32

    # LayerNorm backward (f32): y = xhat*gamma + beta
    dyg = dy * gamma
    mean_dyg = jnp.mean(dyg, axis=-1, keepdims=True)
    mean_dyg_xhat = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dyg - mean_dyg - xhat * mean_dyg_xhat)
    dx_ref[...] = ((do_final.astype(jnp.float32) + dx_ln)
                   .astype(dx_ref.dtype).reshape(dx_ref.shape))

    # parameter-gradient accumulation across the sequential grid
    @pl.when(pl.program_id(0) == 0)
    def _():
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbl_ref[...] = jnp.zeros_like(dbl_ref)

    dwq_ref[...] += jax.lax.dot_general(
        y, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbq_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
    dwp_ref[...] += jax.lax.dot_general(
        attn, do_final, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbp_ref[...] += jnp.sum(do_final.astype(jnp.float32), axis=0,
                            keepdims=True)
    dg_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbl_ref[...] += jnp.sum(dy, axis=0, keepdims=True)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_block_attention(x, gamma, beta, w_qkv, b_qkv, w_proj, b_proj,
                          num_heads, eps=1e-6, scale=None):
    """x + proj(attention(LayerNorm(x))) as one Pallas kernel per direction.

    x: [B, N, C] bf16 residual stream; gamma/beta: [C] f32 LN params;
    w_qkv: [C, 3C], b_qkv: [3C] (timm fused-qkv layout); w_proj: [C, C],
    b_proj: [C]. Returns the next residual stream block, [B, N, C] in
    x.dtype.
    """
    out, _ = _fused_block_fwd(x, gamma, beta, w_qkv, b_qkv, w_proj, b_proj,
                              num_heads, eps, scale)
    return out


def _block_operands(x, gamma, beta, w_qkv, b_qkv, w_proj, b_proj):
    return (gamma.astype(jnp.float32).reshape(1, -1),
            beta.astype(jnp.float32).reshape(1, -1),
            w_qkv.astype(x.dtype), b_qkv.astype(x.dtype).reshape(1, -1),
            w_proj.astype(x.dtype), b_proj.astype(x.dtype).reshape(1, -1))


def _fused_block_fwd(x, gamma, beta, w_qkv, b_qkv, w_proj, b_proj,
                     num_heads, eps, scale):
    B, N, C = x.shape
    D = C // num_heads
    scale_val = (D ** -0.5) if scale is None else scale
    g, bl, wq, bq, wp, bp = _block_operands(x, gamma, beta, w_qkv, b_qkv,
                                            w_proj, b_proj)
    kernel = functools.partial(_block_fwd_kernel, scale_val, num_heads, eps)
    xspec = pl.BlockSpec((1, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[xspec] + [_full_spec(a.shape)
                            for a in (g, bl, wq, bq, wp, bp)],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        interpret=_use_interpret(),
    )(x, g, bl, wq, bq, wp, bp)
    return out, (x, g, bl, wq, bq, wp)


def _fused_block_bwd(num_heads, eps, scale, residuals, d_out):
    x, g, bl, wq, bq, wp = residuals
    B, N, C = x.shape
    D = C // num_heads
    scale_val = (D ** -0.5) if scale is None else scale
    kernel = functools.partial(_block_bwd_kernel, scale_val, num_heads, eps)
    xspec = pl.BlockSpec((1, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((B, N, C), x.dtype),        # dx
        jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),   # d_wqkv
        jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),   # d_bqkv
        jax.ShapeDtypeStruct((C, C), jnp.float32),       # d_wproj
        jax.ShapeDtypeStruct((1, C), jnp.float32),       # d_bproj
        jax.ShapeDtypeStruct((1, C), jnp.float32),       # d_gamma
        jax.ShapeDtypeStruct((1, C), jnp.float32),       # d_beta
    )
    dx, dwq, dbq, dwp, dbp, dg, dbl = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[xspec] + [_full_spec(a.shape)
                            for a in (g, bl, wq, bq, wp)] + [xspec],
        out_specs=(xspec,) + tuple(_full_spec(s.shape) for s in out_shapes[1:]),
        out_shape=out_shapes,
        # the VMEM-resident f32 grad accumulators (d_wqkv 7.1 MB + d_wproj
        # 2.4 MB) push the kernel past the default 16 MB scoped-vmem limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
        interpret=_use_interpret(),
    )(x, g, bl, wq, bq, wp, d_out)
    return (dx, dg.reshape(-1), dbl.reshape(-1), dwq, dbq.reshape(-1),
            dwp, dbp.reshape(-1))


fused_block_attention.defvjp(_fused_block_fwd, _fused_block_bwd)
