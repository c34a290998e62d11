"""Segment reductions — the TPU replacement for PyG's torch-scatter kernels.

PyG message passing (SAGEConv/GATConv/to_hetero, ref: src/models/models_graph.py)
bottoms out in CUDA scatter/segment ops; on TPU the idiomatic equivalent is
jax.ops.segment_* with STATIC num_segments (XLA lowers these to efficient
one-hot matmuls or sorted scatters). All helpers take int32 segment ids and a
static num_segments so the whole GNN step stays jit-compilable with fixed
shapes (full-batch transductive graphs have constant topology).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments: int):
    totals = segment_sum(data, segment_ids, num_segments)
    counts = segment_sum(jnp.ones((data.shape[0],), data.dtype), segment_ids,
                         num_segments)
    return totals / jnp.maximum(counts, 1.0)[:, None]


def segment_max(data, segment_ids, num_segments: int):
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_softmax(logits, segment_ids, num_segments: int):
    """Numerically-stable softmax over edges grouped by destination node
    (GAT attention normalization, torch_geometric.utils.softmax analog)."""
    maxes = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    maxes = jnp.where(jnp.isfinite(maxes), maxes, 0.0)  # empty segments
    shifted = logits - maxes[segment_ids]
    exp = jnp.exp(shifted)
    denom = segment_sum(exp, segment_ids, num_segments)
    return exp / jnp.maximum(denom[segment_ids], 1e-16)
