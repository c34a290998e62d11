"""Loss functions with exact torch-criterion semantics, computed in f32.

The reference's criteria and where they are used:
  CrossEntropyLoss(+class weights)  — every classifier
    (ref: train_baseline.py:38-42). Torch's weighted reduction divides by the
    SUM OF SAMPLE WEIGHTS, not the batch size — reproduced here.
  SmoothL1Loss — ContextNet encoder loss and the projector regression
    (ref: train_baseline_context.py:48, train_projector.py:33). beta=1.
  MSELoss — MultiModal encoder loss (ref: train_baseline_context.py:52).
  nll_loss on log_softmax — GNN stage (ref: train_gnn_embeddings.py:29-30).

Every loss takes an optional f32 `mask` over batch rows; padded rows of the
static-shape final batch contribute zero and are excluded from the divisor.

Inside a `loss_psum_axis(axis)` scope (the trainer's shard_map DP step),
the weighted numerator and denominator psum-combine over the mesh axis
BEFORE the division, so every device computes the identical GLOBAL
torch-semantics mean — exact even when per-shard weight sums differ
(class weights, ragged masks).
"""
from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import jax
import jax.numpy as jnp
from jax import nn as jnn

from artgraph_tpu.models.resnet import at_least_f32

_PSUM_AXIS: contextvars.ContextVar = contextvars.ContextVar(
    "loss_psum_axis", default=None)


@contextlib.contextmanager
def loss_psum_axis(axis: str):
    """Make every loss/metric reduction in this trace scope global over the
    named mesh axis (for use inside shard_map)."""
    token = _PSUM_AXIS.set(axis)
    try:
        yield
    finally:
        _PSUM_AXIS.reset(token)


def psum_if_sharded(value):
    """psum `value` over the active loss_psum_axis scope (identity outside)."""
    axis = _PSUM_AXIS.get()
    if axis is not None:
        return jax.lax.psum(value, axis)
    return value


def _f32_or_wider(x: jnp.ndarray) -> jnp.ndarray:
    """Upcast to f32; keep f64 (the trajectory-parity tests run in f64).
    Same policy as the models' at_least_f32 — one shared definition."""
    return x.astype(at_least_f32(x.dtype))


def _masked(values: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """sum(values*weights)/sum(weights) in f32 (torch 'mean' reduction)."""
    values = _f32_or_wider(values)
    weights = weights.astype(values.dtype)
    num = psum_if_sharded(jnp.sum(values * weights))
    den = psum_if_sharded(jnp.sum(weights))
    return num / jnp.maximum(den, 1e-12)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  class_weights: Optional[jnp.ndarray] = None,
                  mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss semantics.

    logits: [B, C] (any float dtype; softmax in f32), labels: int [B].
    """
    logp = jnn.log_softmax(_f32_or_wider(logits), axis=-1)
    per_sample = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    weights = jnp.ones_like(per_sample)
    if class_weights is not None:
        weights = class_weights.astype(jnp.float32)[labels]
    if mask is not None:
        weights = weights * mask.astype(jnp.float32)
    return _masked(per_sample, weights)


def nll_loss(log_probs: jnp.ndarray, labels: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """torch F.nll_loss over precomputed log-probabilities [N, C]."""
    per_sample = -jnp.take_along_axis(
        log_probs.astype(jnp.float32), labels[:, None], axis=-1)[:, 0]
    weights = jnp.ones_like(per_sample) if mask is None else mask
    return _masked(per_sample, weights)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
              mask: Optional[jnp.ndarray] = None,
              beta: float = 1.0) -> jnp.ndarray:
    """torch.nn.SmoothL1Loss (huber with beta=1, mean over all elements)."""
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    per_elem = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    if mask is None:
        return _masked(per_elem, jnp.ones_like(per_elem))
    w = jnp.broadcast_to(
        mask.astype(jnp.float32).reshape((-1,) + (1,) * (per_elem.ndim - 1)),
        per_elem.shape)
    return _masked(per_elem, w)


def mse(pred: jnp.ndarray, target: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """torch.nn.MSELoss (mean over all elements)."""
    per_elem = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32))
    if mask is None:
        return _masked(per_elem, jnp.ones_like(per_elem))
    w = jnp.broadcast_to(
        mask.astype(jnp.float32).reshape((-1,) + (1,) * (per_elem.ndim - 1)),
        per_elem.shape)
    return _masked(per_elem, w)
