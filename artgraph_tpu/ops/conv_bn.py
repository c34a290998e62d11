"""Fused 1x1-conv + BatchNorm-statistics Pallas unit for ResNet bottlenecks.

A bottleneck's 1x1 convolutions ARE matmuls ([B*H*W, Cin] x [Cin, Cout] —
the exact geometry of ops.mlp's fc layers), and in train mode each one is
followed by a BatchNorm whose batch moments cost a separate full read of the
conv output under XLA (measured 4.5 ms of the 49.4 ms ResNet50 step;
CLAUDE.md round-3 floor analysis). This unit fuses, per 1x1 conv:

    z    = relu(a_in * x + b_in)        (optional prologue: the PREVIOUS
                                         BN's apply + ReLU, in bf16 exactly
                                         as MixedBatchNorm computes it)
    yraw = z @ w                        (MXU, f32 accumulation -> bf16)
    s1   = sum(yraw),  s2 = sum(yraw^2) (f32 per-channel raw moments,
                                         accumulated in VMEM across the
                                         sequential grid)

so the moment sums ride the matmul's epilogue instead of a second HBM pass,
and the previous BN's apply never materializes its own output buffer.

The BN chain itself stays OUTSIDE the unit: models.resnet.MixedBatchNorm
accepts the raw moments (raw_moments=...) and finishes mean/var, the
running-stat EMA, psum-over-mesh-axes and the scale/shift exactly as its
self-computed path does. Autodiff through mean/var then delivers ds1/ds2
cotangents to this unit's backward, which makes the backward a SINGLE pass:

    dyraw = dy + ds1 + 2*yraw*ds2       (the classic two-pass BN backward's
                                         per-channel reductions arrive as
                                         tiny cotangents instead)
    dx    = (dyraw @ w^T) [through the prologue's relu mask and a_in]
    dw   += z^T @ dyraw                 (f32 VMEM accumulator, like
                                         ops.mlp's param grads)
    da,db += prologue reductions

Train-mode only: in eval BN uses running statistics and there are no moment
passes to save — callers keep the XLA path (which fuses the per-channel
affine into the conv epilogue already; CLAUDE.md eval-BN-folding probe).

Ref hot path being rebuilt: /root/reference/src/models/models.py:51-66
(torchvision resnet50 trunk).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from artgraph_tpu.ops.attention import _full_spec, _use_interpret


def _row_chunk(m: int) -> int:
    """Largest sublane-aligned divisor of m up to 1024 (the grid runs
    sequentially, so the chunk only sets VMEM footprint / pipeline depth).
    Every ResNet50 stage size at batch>=1 (M = B*49*4^k) admits one."""
    for r in (1024, 896, 768, 512, 448, 256, 128, 64, 32, 16, 8):
        if m % r == 0:
            return r
    return m


def _fwd_kernel(prologue: bool, x_ref, a_ref, b_ref, w_ref,
                y_ref, s1_ref, s2_ref):
    x = x_ref[...]
    if prologue:
        # scale-shift + ReLU in f32 (Mosaic's cmpf has no bf16 lowering on
        # this target: "Target does not support this comparison"), rounded
        # once to the compute dtype — within 1 ulp of MixedBatchNorm's
        # two-rounding bf16 apply
        zf = (x.astype(jnp.float32) * a_ref[...].astype(jnp.float32)
              + b_ref[...].astype(jnp.float32))
        z = jnp.maximum(zf, 0.0).astype(x.dtype)
    else:
        z = x
    y = jnp.dot(z, w_ref[...], preferred_element_type=jnp.float32)
    yc = y.astype(y_ref.dtype)
    y_ref[...] = yc
    yf = yc.astype(jnp.float32)  # stats from the ROUNDED activations,
    # matching MixedBatchNorm's self-computed moments over the bf16 tensor

    @pl.when(pl.program_id(0) == 0)
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    s1_ref[...] += jnp.sum(yf, axis=0, keepdims=True)
    s2_ref[...] += jnp.sum(yf * yf, axis=0, keepdims=True)


def _bwd_kernel(prologue: bool, x_ref, a_ref, b_ref, w_ref, y_ref,
                dy_ref, ds1_ref, ds2_ref, dx_ref, da_ref, db_ref, dw_ref):
    x = x_ref[...]
    if prologue:
        # same f32 formula as the forward so the ReLU mask matches exactly
        zf = (x.astype(jnp.float32) * a_ref[...].astype(jnp.float32)
              + b_ref[...].astype(jnp.float32))
        z = jnp.maximum(zf, 0.0).astype(x.dtype)
    else:
        z = x

    # total cotangent on the raw conv output: the direct dy plus the moment
    # sums' contributions (s1 = sum y, s2 = sum y^2)
    yf = y_ref[...].astype(jnp.float32)
    dyt = (dy_ref[...].astype(jnp.float32) + ds1_ref[...]
           + 2.0 * yf * ds2_ref[...])
    dyt_b = dyt.astype(x.dtype)

    dz = jax.lax.dot_general(dyt_b, w_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        da_ref[...] = jnp.zeros_like(da_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dw_ref[...] += jax.lax.dot_general(
        z, dyt_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    if prologue:
        dzf = jnp.where(zf > 0, dz, 0.0)
        dx_ref[...] = (dzf * a_ref[...].astype(jnp.float32)
                       ).astype(dx_ref.dtype)
        da_ref[...] += jnp.sum(dzf * x.astype(jnp.float32), axis=0,
                               keepdims=True)
        db_ref[...] += jnp.sum(dzf, axis=0, keepdims=True)
    else:
        dx_ref[...] = dz.astype(dx_ref.dtype)
        da_ref[...] += jnp.zeros_like(da_ref)
        db_ref[...] += jnp.zeros_like(db_ref)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def conv1x1_bn_stats(x, a, b, w, prologue: bool = False):
    """relu(a*x+b) (if prologue) -> x@w -> (yraw, s1, s2).

    x: [M, K] bf16 rows (flattened NHWC); a/b: [K] bf16 scale/shift of the
    PREVIOUS BatchNorm (ignored when prologue=False — pass zeros); w: [K, N]
    conv kernel (reshaped [1,1,K,N]). Returns yraw [M, N] in x.dtype and the
    f32 per-channel raw moment sums s1, s2 of shape [N].
    """
    (yraw, s1, s2), _ = _unit_fwd(x, a, b, w, prologue)
    return yraw, s1, s2


def _operands(x, a, b, w):
    return (a.astype(x.dtype).reshape(1, -1), b.astype(x.dtype).reshape(1, -1),
            w.astype(x.dtype))


def _unit_fwd(x, a, b, w, prologue):
    M, K = x.shape
    N = w.shape[-1]
    ac, bc, wc = _operands(x, a, b, w)
    R = _row_chunk(M)
    kernel = functools.partial(_fwd_kernel, prologue)
    xspec = pl.BlockSpec((R, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((R, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    yraw, s1, s2 = pl.pallas_call(
        kernel,
        grid=(M // R,),
        in_specs=[xspec] + [_full_spec(t.shape) for t in (ac, bc, wc)],
        out_specs=(yspec, _full_spec((1, N)), _full_spec((1, N))),
        out_shape=(jax.ShapeDtypeStruct((M, N), x.dtype),
                   jax.ShapeDtypeStruct((1, N), jnp.float32),
                   jax.ShapeDtypeStruct((1, N), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
        interpret=_use_interpret(),
    )(x, ac, bc, wc)
    return (yraw, s1.reshape(-1), s2.reshape(-1)), (x, a, b, w, yraw)


def _unit_bwd(prologue, residuals, cotangents):
    x, a, b, w, yraw = residuals
    ac, bc, wc = _operands(x, a, b, w)
    dy, ds1, ds2 = cotangents
    M, K = x.shape
    N = wc.shape[-1]
    R = _row_chunk(M)
    kernel = functools.partial(_bwd_kernel, prologue)
    xspec = pl.BlockSpec((R, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((R, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ds1c = ds1.astype(jnp.float32).reshape(1, N)
    ds2c = ds2.astype(jnp.float32).reshape(1, N)
    dx, da, db, dw = pl.pallas_call(
        kernel,
        grid=(M // R,),
        in_specs=[xspec] + [_full_spec(t.shape) for t in (ac, bc, wc)]
        + [yspec, yspec, _full_spec((1, N)), _full_spec((1, N))],
        out_specs=(xspec, _full_spec((1, K)), _full_spec((1, K)),
                   _full_spec((K, N))),
        out_shape=(jax.ShapeDtypeStruct((M, K), x.dtype),
                   jax.ShapeDtypeStruct((1, K), jnp.float32),
                   jax.ShapeDtypeStruct((1, K), jnp.float32),
                   jax.ShapeDtypeStruct((K, N), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
        interpret=_use_interpret(),
    )(x, ac, bc, wc, yraw, dy, ds1c, ds2c)
    # cotangent dtypes must match the primals the caller passed
    return (dx, da.reshape(a.shape).astype(a.dtype),
            db.reshape(b.shape).astype(b.dtype), dw.astype(w.dtype))


conv1x1_bn_stats.defvjp(_unit_fwd, _unit_bwd)
