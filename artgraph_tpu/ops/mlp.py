"""Fused transformer MLP block for ViT-B/16 geometry.

    out = x + fc2(gelu_erf(fc1(LayerNorm(x))))

One Pallas kernel per direction, the MLP twin of
ops.attention.fused_block_attention. After the attention block fused (round
4), the MLP + exact-erf GELU is ~60% of the remaining ViT-B step (CLAUDE.md
perf log; ref hot path: /root/reference/src/models/models.py:97-123 uses
timm's Mlp with exact GELU). XLA's unfused path round-trips the [B, N, 4C]
hidden tensor to HBM twice per direction (~155 MB bf16 each way at B=128,
N=197) plus the LN output and the residual re-read; here the hidden tensor,
the GELU output and d(hidden) live only in VMEM.

The backward recomputes the forward from the SAME saved x (residuals are
x + params only — 39 MB instead of ~350 MB of saved activations per layer)
and accumulates all six parameter gradients (d_w1, d_b1, d_w2, d_b2,
d_gamma, d_beta) in VMEM across the sequential grid. The f32 [C,4C]+[4C,C]
accumulators are 18.9 MB, which with both bf16 weight copies pushes scoped
vmem past the 16 MB default -> vmem_limit_bytes=64MB.

Numerics: LayerNorm statistics and GELU run in f32; contractions take bf16
inputs with f32 accumulation (MXU-rate); the hidden tensor is cast to bf16
between fc1 and GELU exactly as the unfused flax path does
(Dense(dtype=bf16) output), so the kernel matches the module path to bf16
resolution. GELU is the EXACT erf form — timm parity, no tanh approximation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from artgraph_tpu.ops.attention import _ln_rows, _use_interpret, _full_spec

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf_f32(x):
    """erf via the Abramowitz–Stegun 7.1.26 rational approximation.

    Mosaic has no erf lowering (NotImplementedError: "Unimplemented
    primitive ... erf"), so the kernel carries its own. |error| <= 1.5e-7
    ABSOLUTE — at f32 resolution and four orders below bf16 rounding, so
    this is numerically the EXACT-erf GELU (timm parity), not the tanh
    approximation the perf log rules out.
    """
    t = 1.0 / (1.0 + 0.3275911 * jnp.abs(x))
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-x * x)
    return jnp.sign(x) * y


def _gelu_f32(h):
    """Exact (erf) GELU on an f32 tensor."""
    return 0.5 * h * (1.0 + _erf_f32(h * _INV_SQRT2))


def _gelu_grad_f32(h):
    """d gelu(h) / dh in f32: Phi(h) + h * phi(h)."""
    cdf = 0.5 * (1.0 + _erf_f32(h * _INV_SQRT2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * h * h)
    return cdf + h * pdf


def _mlp_fwd_kernel(eps: float, x_ref, g_ref, bl_ref, w1_ref, b1_ref,
                    w2_ref, b2_ref, o_ref):
    # one image per grid step (row-batching BB images to M=BB*N was BUILT
    # AND MEASURED SLOWER: 1039 vs 1072 img/s full step at BB=8 fwd / 4 bwd
    # — Mosaic's sublane padding of M=197 only wastes ~5%, and bigger blocks
    # cost pipeline overlap; same finding as the round-2 attention BB sweep)
    BB, N, C = x_ref.shape
    x = x_ref[...].reshape(BB * N, C)
    xhat, _ = _ln_rows(x.astype(jnp.float32), eps)
    y = (xhat * g_ref[...] + bl_ref[...]).astype(x.dtype)

    h = jnp.dot(y, w1_ref[...], preferred_element_type=jnp.float32)
    h = (h + b1_ref[...].astype(jnp.float32)).astype(x.dtype)  # fc1 output
    act = _gelu_f32(h.astype(jnp.float32)).astype(x.dtype)
    out = jnp.dot(act, w2_ref[...], preferred_element_type=jnp.float32)
    out = (out + b2_ref[...].astype(jnp.float32)).astype(x.dtype)
    o_ref[...] = (x + out).reshape(o_ref.shape)


def _mlp_bwd_kernel(eps: float, x_ref, g_ref, bl_ref, w1_ref, b1_ref,
                    w2_ref, do_ref, dx_ref, dw1_ref, db1_ref, dw2_ref,
                    db2_ref, dg_ref, dbl_ref):
    BB, N, C = x_ref.shape
    x = x_ref[...].reshape(BB * N, C)
    do = do_ref[...].reshape(BB * N, C)

    # recompute the forward from the saved residual-stream block
    xhat, rstd = _ln_rows(x.astype(jnp.float32), eps)
    gamma = g_ref[...]
    y = (xhat * gamma + bl_ref[...]).astype(x.dtype)
    h = jnp.dot(y, w1_ref[...], preferred_element_type=jnp.float32)
    h = (h + b1_ref[...].astype(jnp.float32)).astype(x.dtype)
    hf = h.astype(jnp.float32)
    act = _gelu_f32(hf).astype(x.dtype)

    # fc2 backward: out = act @ w2 + b2 ; block out = x + out => d(out) == do
    dact = jax.lax.dot_general(do, w2_ref[...], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dh = (dact * _gelu_grad_f32(hf)).astype(x.dtype)   # through exact GELU

    # fc1 backward
    dy = jax.lax.dot_general(dh, w1_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [N, C] f32

    # LayerNorm backward (f32): y = xhat*gamma + beta
    dyg = dy * gamma
    mean_dyg = jnp.mean(dyg, axis=-1, keepdims=True)
    mean_dyg_xhat = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dyg - mean_dyg - xhat * mean_dyg_xhat)
    dx_ref[...] = ((do.astype(jnp.float32) + dx_ln)
                   .astype(dx_ref.dtype).reshape(dx_ref.shape))

    # parameter-gradient accumulation across the sequential grid
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbl_ref[...] = jnp.zeros_like(dbl_ref)

    dw1_ref[...] += jax.lax.dot_general(
        y, dh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dh.astype(jnp.float32), axis=0, keepdims=True)
    dw2_ref[...] += jax.lax.dot_general(
        act, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(do.astype(jnp.float32), axis=0, keepdims=True)
    dg_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbl_ref[...] += jnp.sum(dy, axis=0, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_block_mlp(x, gamma, beta, w1, b1, w2, b2, eps=1e-6):
    """x + fc2(gelu_erf(fc1(LayerNorm(x)))) as one Pallas kernel per direction.

    x: [B, N, C] bf16 residual stream; gamma/beta: [C] f32 LN params;
    w1: [C, Hd], b1: [Hd], w2: [Hd, C], b2: [C] (timm Mlp layout).
    Returns the next residual-stream block, [B, N, C] in x.dtype.
    """
    out, _ = _fused_mlp_fwd(x, gamma, beta, w1, b1, w2, b2, eps)
    return out


def _mlp_operands(x, gamma, beta, w1, b1, w2, b2):
    return (gamma.astype(jnp.float32).reshape(1, -1),
            beta.astype(jnp.float32).reshape(1, -1),
            w1.astype(x.dtype), b1.astype(x.dtype).reshape(1, -1),
            w2.astype(x.dtype), b2.astype(x.dtype).reshape(1, -1))


def _fused_mlp_fwd(x, gamma, beta, w1, b1, w2, b2, eps):
    B, N, C = x.shape
    g, bl, w1c, b1c, w2c, b2c = _mlp_operands(x, gamma, beta, w1, b1, w2, b2)
    kernel = functools.partial(_mlp_fwd_kernel, eps)
    xspec = pl.BlockSpec((1, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[xspec] + [_full_spec(a.shape)
                            for a in (g, bl, w1c, b1c, w2c, b2c)],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_use_interpret(),
    )(x, g, bl, w1c, b1c, w2c, b2c)
    return out, (x, g, bl, w1c, b1c, w2c)


def _fused_mlp_bwd(eps, residuals, d_out):
    x, g, bl, w1c, b1c, w2c = residuals
    B, N, C = x.shape
    Hd = w1c.shape[1]
    kernel = functools.partial(_mlp_bwd_kernel, eps)
    xspec = pl.BlockSpec((1, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((B, N, C), x.dtype),      # dx
        jax.ShapeDtypeStruct((C, Hd), jnp.float32),    # d_w1
        jax.ShapeDtypeStruct((1, Hd), jnp.float32),    # d_b1
        jax.ShapeDtypeStruct((Hd, C), jnp.float32),    # d_w2
        jax.ShapeDtypeStruct((1, C), jnp.float32),     # d_b2
        jax.ShapeDtypeStruct((1, C), jnp.float32),     # d_gamma
        jax.ShapeDtypeStruct((1, C), jnp.float32),     # d_beta
    )
    dx, dw1, db1, dw2, db2, dg, dbl = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[xspec] + [_full_spec(a.shape)
                            for a in (g, bl, w1c, b1c, w2c)] + [xspec],
        out_specs=(xspec,) + tuple(_full_spec(s.shape) for s in out_shapes[1:]),
        out_shape=out_shapes,
        # f32 [C,4C]+[4C,C] grad accumulators (18.9 MB) + bf16 weight copies
        # + the recomputed [N, 4C] hidden tensors exceed the 16 MB
        # scoped-vmem default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_use_interpret(),
    )(x, g, bl, w1c, b1c, w2c, d_out)
    return (dx, dg.reshape(-1), dbl.reshape(-1), dw1, db1.reshape(-1),
            dw2, db2.reshape(-1))


fused_block_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
