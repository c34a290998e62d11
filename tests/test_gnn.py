"""Hetero-GNN stack: conv numerics vs numpy oracles, graph container
semantics, full-batch training behavior."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from artgraph_tpu.data.artgraph import ArtGraph, HeteroGraph, OneHot, to_undirected
from artgraph_tpu.models.gnn import (
    GATConv,
    GraphConv,
    HeteroSGNN,
    SAGEConv,
    TypedLinear,
)
from artgraph_tpu.ops.segment import segment_mean, segment_softmax, segment_sum
from artgraph_tpu.train import nll_loss


def test_typed_linear_onehot_equals_eye():
    key = jax.random.PRNGKey(0)
    lin = TypedLinear(5)
    one_hot = OneHot(7)
    variables = lin.init(key, one_hot)
    out_sym = lin.apply(variables, one_hot)
    out_dense = lin.apply(variables, jnp.eye(7))
    np.testing.assert_allclose(np.asarray(out_sym), np.asarray(out_dense),
                               rtol=1e-6)


def test_segment_softmax_normalizes_per_destination():
    logits = jnp.asarray([1.0, 2.0, 3.0, -1.0, 0.5])
    seg = jnp.asarray([0, 0, 1, 1, 1])
    out = np.asarray(segment_softmax(logits, seg, 3))
    assert abs(out[:2].sum() - 1.0) < 1e-6
    assert abs(out[2:].sum() - 1.0) < 1e-6


def _bipartite():
    rng = np.random.default_rng(0)
    x_src = rng.normal(size=(5, 4)).astype(np.float32)
    x_dst = rng.normal(size=(3, 6)).astype(np.float32)
    edges = np.asarray([[0, 1, 2, 4, 4], [0, 0, 1, 1, 2]], dtype=np.int32)
    return x_src, x_dst, edges


def test_sage_conv_numpy_oracle():
    x_src, x_dst, edges = _bipartite()
    conv = SAGEConv(8)
    variables = conv.init(jax.random.PRNGKey(0), x_src, x_dst, edges, 3)
    out = np.asarray(conv.apply(variables, x_src, x_dst, edges, 3))

    p = variables["params"]
    w_l, w_r = np.asarray(p["lin_l"]["kernel"]), np.asarray(p["lin_r"]["kernel"])
    b = np.asarray(p["bias"])
    expected = np.zeros((3, 8), np.float32)
    for i in range(3):
        neigh = x_src[edges[0][edges[1] == i]]
        expected[i] = neigh.mean(0) @ w_l + x_dst[i] @ w_r + b
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_graph_conv_numpy_oracle():
    x_src, x_dst, edges = _bipartite()
    conv = GraphConv(8)
    variables = conv.init(jax.random.PRNGKey(1), x_src, x_dst, edges, 3)
    out = np.asarray(conv.apply(variables, x_src, x_dst, edges, 3))

    p = variables["params"]
    w_rel, w_root = np.asarray(p["lin_rel"]["kernel"]), np.asarray(p["lin_root"]["kernel"])
    b = np.asarray(p["bias"])
    expected = np.zeros((3, 8), np.float32)
    for i in range(3):
        neigh = x_src[edges[0][edges[1] == i]]
        expected[i] = neigh.sum(0) @ w_rel + x_dst[i] @ w_root + b
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_gat_conv_numpy_oracle():
    x_src, x_dst, edges = _bipartite()
    conv = GATConv(8)
    variables = conv.init(jax.random.PRNGKey(2), x_src, x_dst, edges, 3)
    out = np.asarray(conv.apply(variables, x_src, x_dst, edges, 3))

    p = variables["params"]
    h_s = x_src @ np.asarray(p["lin_src"]["kernel"])
    h_d = x_dst @ np.asarray(p["lin_dst"]["kernel"])
    a_s = (h_s @ np.asarray(p["att_src"]))[:, 0]
    a_d = (h_d @ np.asarray(p["att_dst"]))[:, 0]
    logits = a_s[edges[0]] + a_d[edges[1]]
    logits = np.where(logits >= 0, logits, 0.2 * logits)
    expected = np.zeros((3, 8), np.float32)
    for i in range(3):
        sel = edges[1] == i
        att = np.exp(logits[sel] - logits[sel].max())
        att = att / att.sum()
        expected[i] = (att[:, None] * h_s[edges[0][sel]]).sum(0)
    expected += np.asarray(p["bias"])
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_artgraph_loader_and_to_undirected(synthetic_graph):
    ds = ArtGraph(os.path.join(synthetic_graph["root"], "train"),
                  preprocess="one-hot", features=True, type="train")
    g = ds[0]
    counts = synthetic_graph["counts"]
    assert g.num_nodes["artwork"] == counts["artwork"]
    assert isinstance(g.node_features["tag"], OneHot)
    assert g.node_features["artwork"].shape == (counts["artwork"],
                                                synthetic_graph["feat_dim"])
    assert g.num_classes == {"style": counts["style"], "genre": counts["genre"]}
    assert ("artwork", "style_rel", "style") in g.edges
    assert len(g.edges) == 9

    ug = to_undirected(g)
    # 8 cross-type relations gain a rev_ counterpart; the same-type
    # artist-teacher-artist relation doubles in place
    assert len(ug.edges) == 17
    assert ("style", "rev_style_rel", "artwork") in ug.edges
    teacher = ug.edges[("artist", "teacher_rel", "artist")]
    assert teacher.shape[1] == 2 * g.edges[("artist", "teacher_rel", "artist")].shape[1]
    fwd = g.edges[("artwork", "style_rel", "style")]
    rev = ug.edges[("style", "rev_style_rel", "artwork")]
    np.testing.assert_array_equal(fwd[0], rev[1])
    np.testing.assert_array_equal(fwd[1], rev[0])


def test_hetero_sgnn_full_batch_training(synthetic_graph):
    """Full-batch NLL training on the toy KG must reduce the loss, and the
    returned artwork embedding must be the 128-dim post-BN hidden state."""
    g = to_undirected(ArtGraph(os.path.join(synthetic_graph["root"], "train_train"),
                               preprocess="one-hot", features=True)[0])
    hidden = 16
    model = HeteroSGNN(metadata=g.metadata, operator="GATConv",
                       activation="relu", aggr="sum", hidden_channels=hidden,
                       out_channels=synthetic_graph["counts"]["style"],
                       n_layers=2, dropout=0.0, bn=True, skip=False)
    y = jnp.asarray(g.labels["y_style"])
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, g.node_features, g.edges, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(0.01)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            (emb, outs), mut = model.apply(
                {"params": p, "batch_stats": stats}, g.node_features, g.edges,
                train=True, rngs={"dropout": rng}, mutable=["batch_stats"])
            return nll_loss(outs[0]["artwork"], y), mut["batch_stats"]
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    losses = []
    for _ in range(30):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]

    emb, outs = model.apply({"params": params, "batch_stats": stats},
                            g.node_features, g.edges, train=False)
    assert emb["artwork"].shape == (synthetic_graph["counts"]["artwork"], hidden)
    # log_softmax outputs: rows sum to 1 in prob space
    probs = np.exp(np.asarray(outs[0]["artwork"]))
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-5)


def test_gnn_operator_variants(synthetic_graph):
    g = to_undirected(ArtGraph(os.path.join(synthetic_graph["root"], "train_train"),
                               preprocess="one-hot", features=True)[0])
    for op in ("SAGEConv", "GraphConv", "GINConv"):
        model = HeteroSGNN(metadata=g.metadata, operator=op, hidden_channels=8,
                           out_channels=4, n_layers=1, dropout=0.0, bn=False)
        variables = model.init(jax.random.PRNGKey(0), g.node_features, g.edges)
        emb, outs = model.apply(variables, g.node_features, g.edges)
        assert outs[0]["artwork"].shape == (12, 4), op


def test_hetero_mgnn_and_homo_gnn(synthetic_graph):
    from artgraph_tpu.models.gnn import HeteroMGNN, HomoSGNN

    g = to_undirected(ArtGraph(os.path.join(synthetic_graph["root"], "train_train"),
                               preprocess="one-hot", features=True)[0])
    counts = synthetic_graph["counts"]
    model = HeteroMGNN(metadata=g.metadata, hidden_channels=8,
                       out_channels={"artist": counts["artist"],
                                     "style": counts["style"],
                                     "genre": counts["genre"]},
                      n_layers=1, dropout=0.0, bn=False)
    variables = model.init(jax.random.PRNGKey(0), g.node_features, g.edges)
    outs = model.apply(variables, g.node_features, g.edges)
    assert len(outs) == 3
    assert outs[1][1][0]["artwork"].shape == (counts["artwork"], counts["style"])

    # homogeneous path with GCN
    n = 10
    x = np.random.default_rng(0).normal(size=(n, 6)).astype(np.float32)
    edges = np.asarray([[0, 1, 2, 3, 4], [5, 6, 7, 8, 9]], dtype=np.int32)
    homo = HomoSGNN(operator="GCNConv", hidden_channels=4, out_channels=3,
                    n_layers=1)
    variables = homo.init(jax.random.PRNGKey(1), x, edges)
    emb, outs = homo.apply(variables, x, edges)
    assert emb.shape == (n, 4) and outs[0].shape == (n, 3)


def test_utils_dropin_surface():
    import artgraph_tpu.utils as U
    for name in ("get_base_arguments", "prepare_raw_dataset", "load_dataset",
                 "load_dataset_multimodal", "load_dataset_new_multimodal",
                 "load_dataset_multitask_new_multimodal",
                 "load_dataset_projection", "get_class_weights",
                 "prepare_dataloader", "tracker", "tracker_multitask",
                 "track_params"):
        assert callable(getattr(U, name)), name


def test_gat_self_loops_transform(synthetic_graph):
    """pyg 2.0.2 GATConv(add_self_loops=True) semantics: existing (i,i)
    edges removed, (i,i) appended for i < min(N_src, N_dst), per relation."""
    import os

    from artgraph_tpu.data.artgraph import ArtGraph, gat_self_loops

    g = ArtGraph(os.path.join(synthetic_graph["root"], "train"))[0]
    g2 = gat_self_loops(g)
    for (h, r, t), ei in g2.edges.items():
        n = min(g.num_nodes[h], g.num_nodes[t])
        orig = g.edges[(h, r, t)]
        kept = orig[:, orig[0] != orig[1]]
        assert ei.shape[1] == kept.shape[1] + n
        loops = ei[:, -n:]
        np.testing.assert_array_equal(loops[0], loops[1])
        np.testing.assert_array_equal(loops[0], np.arange(n))
        # non-loop prefix preserved verbatim
        np.testing.assert_array_equal(ei[:, :kept.shape[1]], kept)


def test_del_some_nodes(synthetic_graph):
    import os

    from artgraph_tpu.data.artgraph import ArtGraph, del_some_nodes

    g = ArtGraph(os.path.join(synthetic_graph["root"], "train"))[0]
    g2 = del_some_nodes(g)
    assert set(g2.num_nodes) == {"artwork", "artist", "style", "tag", "media"}
    for (h, r, t) in g2.edges:
        assert h in g2.num_nodes and t in g2.num_nodes
    assert ("artist", "teacher_rel", "artist") not in g2.edges
    assert ("artwork", "style_rel", "style") in g2.edges
