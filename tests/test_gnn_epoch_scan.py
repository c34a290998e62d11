"""GNN chunked epoch-scan: 5-epoch lax.scan chunks match the per-epoch loop.

The GNN trainer's default path compiles 5-epoch chunks into one XLA program
each (cli/train_gnn_embeddings.py::make_train_chunk); `--no_epoch_scan` keeps
the reference's one-dispatch-per-epoch loop (ref src/train_gnn_embeddings.py:
61-80). Both must produce the same trajectory: same fold_in(rng, epoch)
dropout stream, same Adam/BatchNorm state threading, same per-epoch losses
and final params. Chunk boundaries must land exactly on the print/checkpoint
epochs (epoch % 5 == 0) for any resume start.
"""
import numpy as np

import jax
import jax.numpy as jnp

from artgraph_tpu.cli.train_gnn_embeddings import (
    epoch_chunks,
    make_steps,
    make_train_chunk,
)
from artgraph_tpu.data.artgraph import HeteroGraph, with_csr
from artgraph_tpu.models.gnn import HeteroSGNN
from artgraph_tpu.train.trainer import adam

OUT = 4
N = {"artwork": 12, "style": 4}


def _graph(seed=0):
    rng = np.random.default_rng(seed)
    e = np.stack([rng.integers(0, N["artwork"], 30),
                  rng.integers(0, N["style"], 30)]).astype(np.int32)
    return HeteroGraph(
        node_features={
            "artwork": rng.normal(size=(N["artwork"], 6)).astype(np.float32),
            "style": rng.normal(size=(N["style"], 5)).astype(np.float32)},
        num_nodes=dict(N),
        edges={("artwork", "style_rel", "style"): e,
               ("style", "rev_style_rel", "artwork"): e[::-1].copy()},
        labels={"y": rng.integers(0, OUT, N["artwork"]).astype(np.int32)})


def _setup(graph, csr):
    model = HeteroSGNN(metadata=graph.metadata, operator="GATConv",
                       hidden_channels=8, out_channels=OUT, n_layers=2,
                       dropout=0.4, bn=True)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, graph.node_features, graph.edges,
                           train=False, csr=csr)
    tx = adam(1e-2)
    return model, tx, rng, variables


def _run_loop(model, tx, rng, variables, graph, csr, epochs):
    train_step, _ = make_steps(model, tx)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    opt = tx.init(params)
    y = jnp.asarray(graph.labels["y"])
    losses = []
    for epoch in range(epochs):
        step_rng = jax.random.fold_in(rng, epoch)
        params, stats, opt, loss, logp = train_step(
            params, stats, opt, step_rng, graph.node_features, graph.edges,
            csr, y)
        losses.append(float(loss))
    return params, stats, losses, np.asarray(logp)


def _run_chunked(model, tx, rng, variables, graph, csr, epochs, start=0):
    train_chunk = make_train_chunk(model, tx)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    opt = tx.init(params)
    y = jnp.asarray(graph.labels["y"])
    losses = []
    for c0, c1 in epoch_chunks(start, epochs):
        params, stats, opt, ls, logp = train_chunk(
            params, stats, opt, rng, graph.node_features, graph.edges, csr,
            y, jnp.int32(c0), c1 - c0)
        losses.extend(float(l) for l in ls)
    return params, stats, losses, np.asarray(logp)


def _assert_trees_close(a, b, rtol=1e-5, atol=1e-6):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol), a, b)


def test_epoch_chunks_cadence():
    # boundaries land right after every print epoch (e % 5 == 0)
    assert list(epoch_chunks(0, 12)) == [(0, 1), (1, 6), (6, 11), (11, 12)]
    assert list(epoch_chunks(0, 50))[-1] == (46, 50)
    assert list(epoch_chunks(6, 12)) == [(6, 11), (11, 12)]  # resume at 6
    assert list(epoch_chunks(3, 6)) == [(3, 6)]
    assert list(epoch_chunks(0, 1)) == [(0, 1)]
    assert list(epoch_chunks(5, 5)) == []
    for start, total in [(0, 17), (2, 9), (7, 31)]:
        spans = list(epoch_chunks(start, total))
        assert [e for c in spans for e in range(*c)] == list(
            range(start, total))
        for _, end in spans[:-1]:
            assert (end - 1) % 5 == 0


def test_chunked_scan_matches_per_epoch_loop():
    graph = _graph()
    model, tx, rng, variables = _setup(graph, csr=None)
    p_a, s_a, l_a, logp_a = _run_loop(model, tx, rng, variables, graph,
                                      None, epochs=7)
    model, tx, rng, variables = _setup(graph, csr=None)
    p_b, s_b, l_b, logp_b = _run_chunked(model, tx, rng, variables, graph,
                                         None, epochs=7)
    np.testing.assert_allclose(l_a, l_b, rtol=1e-5)
    np.testing.assert_allclose(logp_a, logp_b, rtol=1e-4, atol=1e-5)
    _assert_trees_close(p_a, p_b)
    _assert_trees_close(s_a, s_b)


def test_chunked_scan_matches_loop_with_csr_kernels():
    # the single-device CLI path: dst-sorted CSR + Pallas segment kernels
    # (interpret mode on CPU) inside the scanned chunk body
    graph, csr = with_csr(_graph(seed=1))
    model, tx, rng, variables = _setup(graph, csr)
    p_a, s_a, l_a, _ = _run_loop(model, tx, rng, variables, graph, csr,
                                 epochs=6)
    model, tx, rng, variables = _setup(graph, csr)
    p_b, s_b, l_b, _ = _run_chunked(model, tx, rng, variables, graph, csr,
                                    epochs=6)
    np.testing.assert_allclose(l_a, l_b, rtol=1e-5)
    _assert_trees_close(p_a, p_b)
    _assert_trees_close(s_a, s_b)


def test_chunked_resume_alignment():
    # a resume from epoch 3 must continue the same stream: loop 0..7 ==
    # chunked 0..3 then chunked 3..7 (boundaries re-aligned to print epochs)
    graph = _graph(seed=2)
    model, tx, rng, variables = _setup(graph, csr=None)
    p_a, s_a, l_a, _ = _run_loop(model, tx, rng, variables, graph, None,
                                 epochs=7)

    model, tx, rng, variables = _setup(graph, csr=None)
    train_chunk = make_train_chunk(model, tx)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    opt = tx.init(params)
    y = jnp.asarray(graph.labels["y"])
    losses = []
    for start, total in ((0, 3), (3, 7)):
        for c0, c1 in epoch_chunks(start, total):
            params, stats, opt, ls, _ = train_chunk(
                params, stats, opt, rng, graph.node_features, graph.edges,
                None, y, jnp.int32(c0), c1 - c0)
            losses.extend(float(l) for l in ls)
    np.testing.assert_allclose(l_a, losses, rtol=1e-5)
    _assert_trees_close(p_a, params)
    _assert_trees_close(s_a, stats)
