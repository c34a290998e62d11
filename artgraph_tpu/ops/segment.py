"""Segment reductions — the TPU replacement for PyG's torch-scatter kernels.

PyG message passing (SAGEConv/GATConv/to_hetero, ref: src/models/models_graph.py)
bottoms out in CUDA scatter/segment ops; on TPU the idiomatic equivalent is
jax.ops.segment_* with STATIC num_segments (XLA lowers these to efficient
one-hot matmuls or sorted scatters). All helpers take int32 segment ids and a
static num_segments so the whole GNN step stays jit-compilable with fixed
shapes (full-batch transductive graphs have constant topology).

All helpers accept an optional `axis_name`: inside a shard_map over
edge-sharded arrays, local per-shard reductions are combined with psum/pmax
over that mesh axis — full-graph message passing scales over devices while
node tensors stay replicated (out-of-range padded edge ids are dropped by
XLA's scatter semantics, so shards may be zero-padded to equal size).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int,
                axis_name: Optional[str] = None):
    out = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


def segment_mean(data, segment_ids, num_segments: int,
                 axis_name: Optional[str] = None):
    totals = segment_sum(data, segment_ids, num_segments, axis_name)
    counts = segment_sum(jnp.ones((data.shape[0],), data.dtype), segment_ids,
                         num_segments, axis_name)
    return totals / jnp.maximum(counts, 1.0)[:, None]


def segment_max(data, segment_ids, num_segments: int,
                axis_name: Optional[str] = None):
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    if axis_name is not None:
        out = jax.lax.pmax(out, axis_name)
    return out


def segment_softmax(logits, segment_ids, num_segments: int,
                    axis_name: Optional[str] = None):
    """Numerically-stable softmax over edges grouped by destination node
    (GAT attention normalization, torch_geometric.utils.softmax analog).

    With axis_name, logits are the local edge shard: maxima and exp-sums are
    combined across shards so attention normalizes over ALL incoming edges;
    the returned per-edge weights stay local to the shard.
    """
    # the max shift is purely for numerical stability — no gradient flows
    # through it (and pmax has no differentiation rule), so detach the input
    maxes = segment_max(jax.lax.stop_gradient(logits), segment_ids,
                        num_segments, axis_name)
    maxes = jnp.where(jnp.isfinite(maxes), maxes, 0.0)  # empty segments
    safe_ids = jnp.minimum(segment_ids, num_segments - 1)
    shifted = logits - maxes[safe_ids]
    exp = jnp.exp(shifted)
    denom = segment_sum(exp, segment_ids, num_segments, axis_name)
    return exp / jnp.maximum(denom[safe_ids], 1e-16)
