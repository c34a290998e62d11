"""Edge-sharded full-graph GNN execution over a device mesh.

The GNN stage's hot loop is segment-op message passing over every edge of the
KG (ref: train_gnn_embeddings.py:39-52 runs it single-device). Here the edge
arrays of every relation are zero-padded to a multiple of the mesh's data-axis
size and sharded across devices; node tensors (features, parameters, BN
state) stay replicated. Inside `shard_map`, each device reduces its edge
shard locally and the partial aggregates combine with psum/pmax over ICI
(axis-aware variants in artgraph_tpu.ops.segment). Padded edges carry
dst = num_dst (out of range) — XLA scatter semantics drop them.

This is the SURVEY.md §2.2(b) "sharded full-graph GNN step" component; the
model itself is unchanged (HeteroSGNN(axis_name='data')).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from artgraph_tpu.data.artgraph import HeteroGraph


def pad_and_shard_edges(graph: HeteroGraph, num_shards: int) -> Dict:
    """Pad every relation's [2, E] edge array to a multiple of num_shards.

    Padding edges use src=0 and dst=num_dst(src type irrelevant): the
    out-of-range destination makes every segment reduction drop them.
    """
    edges = {}
    for (src_t, rel, dst_t), edge_index in graph.edges.items():
        e = edge_index.shape[1]
        padded = (e + num_shards - 1) // num_shards * num_shards
        if padded != e:
            num_dst = graph.num_nodes[dst_t]
            pad = np.zeros((2, padded - e), dtype=edge_index.dtype)
            pad[1, :] = num_dst  # dropped by scatter
            edge_index = np.concatenate([edge_index, pad], axis=1)
        edges[(src_t, rel, dst_t)] = edge_index
    return edges


def shard_graph_csr(graph: HeteroGraph, num_shards: int):
    """Per-shard sorted edges + stacked EdgeCSR metadata: the Pallas CSR
    kernels composed with edge sharding.

    Each relation is zero-padded to a shard multiple (sentinel dst =
    num_dst, see ops.csr_segment._csr_from_sorted), split into contiguous
    shards, and every shard is dst-sorted with its own CSR built. Shard
    CSRs stack along a new leading axis so they can be device_put with the
    shard dim sharded over the mesh — inside shard_map each device peels
    its own metadata (leading dim 1) and reduces its local edges with the
    kernels; partial aggregates psum-combine (models.gnn axis_name path).

    Returns (edges dict in shard-major dst-sorted order, stacked-CSR dict).
    """
    from artgraph_tpu.ops.csr_segment import build_edge_csr

    edges_padded = pad_and_shard_edges(graph, num_shards)
    out_edges, out_csrs = {}, {}
    for (src_t, rel, dst_t), ei in edges_padded.items():
        sz = ei.shape[1] // num_shards
        chunks, csrs = [], []
        for k in range(num_shards):
            # as_numpy: keep metadata host-side until the single device_put
            # in device_put_graph_csr (no device round-trip per shard)
            sorted_chunk, ecsr = build_edge_csr(
                ei[:, k * sz:(k + 1) * sz],
                graph.num_nodes[src_t], graph.num_nodes[dst_t],
                as_numpy=True)
            chunks.append(sorted_chunk)
            csrs.append(ecsr)
        out_edges[(src_t, rel, dst_t)] = np.concatenate(chunks, axis=1)
        out_csrs[(src_t, rel, dst_t)] = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *csrs)
    return out_edges, out_csrs


def init_variables(model, rng, x_dict, edges, **kwargs):
    """Initialize a sharded-model's variables OUTSIDE shard_map.

    axis_name doesn't affect parameter shapes, but collectives are unbound
    outside shard_map — init with an axis-free clone instead.
    """
    return model.clone(axis_name=None).init(rng, x_dict, edges, **kwargs)


def make_sharded_forward(model, mesh: Mesh, axis: str = "data"):
    """Build forward(variables, x_dict, edges) running edge-sharded.

    `model` must be constructed with axis_name=axis. Returns a function whose
    outputs are fully replicated. Differentiable (psum transposes correctly),
    so it can sit inside a jitted train step's loss function.
    """
    from artgraph_tpu.parallel.mesh import shard_map

    edge_spec = P(None, axis)  # shard the E dimension of [2, E]

    def forward(variables, x_dict, edges, train: bool = False, rngs=None,
                csr=None):
        edge_specs = jax.tree_util.tree_map(lambda _: edge_spec, edges)

        def apply(variables, x_dict, edges_shard, csr_local):
            kw = dict(train=train, csr=csr_local)
            if train:
                return model.apply(variables, x_dict, edges_shard,
                                   rngs=rngs, mutable=["batch_stats"], **kw)
            return model.apply(variables, x_dict, edges_shard, **kw)

        if csr is None:
            @functools.partial(
                shard_map, mesh=mesh,
                in_specs=(P(), P(), edge_specs),
                out_specs=P())
            def sharded(variables, x_dict, edges_shard):
                return apply(variables, x_dict, edges_shard, None)

            return sharded(variables, x_dict, edges)

        # kernel path: stacked per-shard CSR metadata (shard_graph_csr),
        # leading shard dim sharded over the axis; each device peels its
        # own [1, ...] block back into a local EdgeCSR
        csr_specs = jax.tree_util.tree_map(lambda _: P(axis), csr)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(), edge_specs, csr_specs),
            out_specs=P())
        def sharded_csr(variables, x_dict, edges_shard, csr_shard):
            csr_local = jax.tree_util.tree_map(lambda a: a[0], csr_shard)
            return apply(variables, x_dict, edges_shard, csr_local)

        return sharded_csr(variables, x_dict, edges, csr)

    return forward


def device_put_graph(graph: HeteroGraph, mesh: Mesh, axis: str = "data"):
    """Place a graph on the mesh: node features replicated, edges sharded
    (pre-padded via pad_and_shard_edges)."""
    num_shards = mesh.shape[axis]
    edges = pad_and_shard_edges(graph, num_shards)
    edge_sharding = NamedSharding(mesh, P(None, axis))
    replicated = NamedSharding(mesh, P())
    placed_edges = {k: jax.device_put(v, edge_sharding)
                    for k, v in edges.items()}
    placed_feats = jax.device_put(graph.node_features, replicated)
    return placed_feats, placed_edges


def device_put_graph_csr(graph: HeteroGraph, mesh: Mesh, axis: str = "data"):
    """device_put_graph for the Pallas-kernel path: edges in shard-major
    dst-sorted order + per-shard CSR metadata (leading shard dim sharded).
    Feed the returned csr dict to make_sharded_forward(..., csr=...)."""
    num_shards = mesh.shape[axis]
    edges, csrs = shard_graph_csr(graph, num_shards)
    edge_sharding = NamedSharding(mesh, P(None, axis))
    shard_leading = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    placed_edges = {k: jax.device_put(v, edge_sharding)
                    for k, v in edges.items()}
    placed_csrs = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, shard_leading), csrs)
    placed_feats = jax.device_put(graph.node_features, replicated)
    return placed_feats, placed_edges, placed_csrs
