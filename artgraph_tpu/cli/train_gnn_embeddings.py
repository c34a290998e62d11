"""KG node-embedding producer (pipeline stage 1): full-batch transductive
hetero-GNN training.

CLI-compatible rebuild of ref src/train_gnn_embeddings.py: loads the 4 graph
variants (train full + train_train/train_validation/train_test, ref :110-115),
applies ToUndirected (:117-120), trains a 2-layer HeteroSGNN (GATConv default,
hidden 128, aggr sum, bn, dropout 0.4) with NLL on artwork nodes, prints
metrics every 5 epochs, then saves the 128-dim artwork hidden states to the
two reference file names (:91-92).

The entire epoch (full-graph fwd+bwd+Adam) is ONE jitted XLA program, and by
default 5-epoch chunks compile into ONE lax.scan program each (the graph is
device-resident, so the host has nothing to do between epochs — 50 epochs run
as ~11 dispatches; `--no_epoch_scan` opts out); the reference's per-epoch PyG
scatter/gather hot loop (SURVEY.md §3.2) becomes segment-op matmuls on the
MXU. Quirk fixed+documented: the reference declares --lr with type=int
(ref :16); ours is float with the same 0.01 default.
"""
from __future__ import annotations

import argparse
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from artgraph_tpu import config
from artgraph_tpu.data.artgraph import ArtGraph, to_undirected
from artgraph_tpu.data.embeddings import save_embedding
from artgraph_tpu.models.gnn import HeteroSGNN
from artgraph_tpu.train import nll_loss
from artgraph_tpu.train.trainer import adam


def get_accuracy(log_probs: np.ndarray, labels: np.ndarray) -> float:
    return float((np.argmax(log_probs, axis=1) == labels).mean())


def _make_applies(model, mesh=None):
    """train/eval apply closures; with a mesh, edge arrays are sharded over
    the 'data' axis and segment reductions psum over ICI
    (parallel.gnn_parallel); single-device otherwise."""
    if mesh is not None:
        from artgraph_tpu.parallel.gnn_parallel import make_sharded_forward

        forward = make_sharded_forward(model, mesh)

        def apply_train(variables, x, edges, csr, rng):
            return forward(variables, x, edges, train=True,
                           rngs={"dropout": rng}, csr=csr)

        def apply_eval(variables, x, edges, csr):
            return forward(variables, x, edges, train=False, csr=csr)
    else:
        def apply_train(variables, x, edges, csr, rng):
            return model.apply(variables, x, edges, train=True, csr=csr,
                               rngs={"dropout": rng}, mutable=["batch_stats"])

        def apply_eval(variables, x, edges, csr):
            return model.apply(variables, x, edges, train=False, csr=csr)

    return apply_train, apply_eval


def make_steps(model, tx, mesh=None):
    """Jitted full-graph train/eval steps."""
    apply_train, apply_eval = _make_applies(model, mesh)

    @partial(jax.jit, donate_argnums=(0, 2))
    def train_step(params, batch_stats, opt_state, rng, x, edges, csr, y):
        def loss_fn(p):
            (emb, outs), mut = apply_train(
                {"params": p, "batch_stats": batch_stats}, x, edges, csr, rng)
            loss = nll_loss(outs[0]["artwork"], y)
            return loss, (outs[0]["artwork"], mut["batch_stats"])

        (loss, (logp, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss, logp

    @jax.jit
    def eval_step(params, batch_stats, x, edges, csr, y):
        emb, outs = apply_eval({"params": params, "batch_stats": batch_stats},
                               x, edges, csr)
        logp = outs[0]["artwork"]
        return nll_loss(logp, y), logp, emb["artwork"]

    return train_step, eval_step


def make_train_chunk(model, tx, mesh=None):
    """Compile a CHUNK of full-batch training epochs as one lax.scan program.

    The reference's training loop (ref src/train_gnn_embeddings.py:61-80) is
    one host-dispatched step per epoch; with the whole graph device-resident
    there is nothing for the host to do between epochs, so a chunk of epochs
    compiles into a single XLA program (train math identical to
    `make_steps`'s train_step; same fold_in(rng, epoch) stream via the traced
    epoch0 offset). Validation metrics are only consumed every 5 epochs, so
    the per-epoch val forward moves OUT of the loop entirely — the chunked
    path evaluates once per chunk boundary instead of once per epoch.
    Returns (params, batch_stats, opt_state, per-epoch losses, last logp).
    """
    apply_train, _ = _make_applies(model, mesh)

    @partial(jax.jit, static_argnums=(9,), donate_argnums=(0, 2))
    def train_chunk(params, batch_stats, opt_state, rng, x, edges, csr, y,
                    epoch0, n_epochs):
        def body(carry, i):
            params, batch_stats, opt_state, _ = carry
            step_rng = jax.random.fold_in(rng, epoch0 + i)

            def loss_fn(p):
                (emb, outs), mut = apply_train(
                    {"params": p, "batch_stats": batch_stats}, x, edges, csr,
                    step_rng)
                loss = nll_loss(outs[0]["artwork"], y)
                return loss, (outs[0]["artwork"], mut["batch_stats"])

            (loss, (logp, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, opt_state, logp), loss

        logp0 = jnp.zeros((y.shape[0], model.out_channels), jnp.float32)
        (params, batch_stats, opt_state, logp), losses = jax.lax.scan(
            body, (params, batch_stats, opt_state, logp0),
            jnp.arange(n_epochs, dtype=jnp.int32))
        return params, batch_stats, opt_state, losses, logp

    return train_chunk


def epoch_chunks(start: int, total: int, interval: int = 5):
    """Chunk [start, total) so every boundary lands right after a
    print/checkpoint epoch (epoch % interval == 0), preserving the
    reference loop's observable cadence exactly."""
    epoch = start
    while epoch < total:
        nxt = epoch + (-epoch) % interval  # first print epoch >= epoch
        end = nxt + 1 if nxt < total else total
        yield epoch, end
        epoch = end


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--label', type=str, default='style',
                        help='Label to predict (style|genre).')
    parser.add_argument('--operator', type=str, default='GATConv',
                        help='GCN operator.')
    parser.add_argument('--lr', type=float, default=0.01, help='Learning rate.')
    parser.add_argument('--epochs', type=int, default=50, help='Epochs.')
    parser.add_argument('--activation', type=str, default='relu',
                        help='Activation (relu|prelu).')
    parser.add_argument('--data_parallel', type=int, default=0,
                        help='Devices for edge-sharded message passing '
                             '(0 = single device).')
    parser.add_argument('--no_self_loops', action='store_true',
                        help='Disable the PyG GATConv add_self_loops=True '
                             'semantics (reference default adds min(N_src, '
                             'N_dst) self-loops per relation).')
    parser.add_argument('--resume', type=str, default=None,
                        help='Checkpoint directory for crash recovery: full '
                             'train state saved via Orbax every 5 epochs; '
                             'training continues from it when present.')
    parser.add_argument('--no_epoch_scan', action='store_true',
                        help='Dispatch one XLA program per epoch instead of '
                             'compiling 5-epoch chunks as one lax.scan '
                             'program (the default; numerics identical).')
    args = parser.parse_args(argv)

    graphs = {
        name: to_undirected(ArtGraph(
            os.path.join(config.DATASET_DIR, name), preprocess='one-hot',
            features=True, type=split)[0])
        for name, split in (("train", "train"), ("train_train", "train"),
                            ("train_validation", "validation"),
                            ("train_test", "test"))
    }
    if args.operator == 'GATConv' and not args.no_self_loops:
        # pyg 2.0.2 GATConv defaults add per-relation self-loops; the
        # published embeddings include them (data.artgraph.gat_self_loops)
        from artgraph_tpu.data.artgraph import gat_self_loops
        graphs = {name: gat_self_loops(g) for name, g in graphs.items()}
    # single-device path: sort edges by destination once and use the Pallas
    # CSR segment kernels (ops.csr_segment) instead of XLA scatters
    csrs = {name: None for name in graphs}
    if not args.data_parallel:
        from artgraph_tpu.data.artgraph import with_csr
        for name in list(graphs):
            graphs[name], csrs[name] = with_csr(graphs[name])
    data_train_full = graphs["train"]
    data_train = graphs["train_train"]
    data_validation = graphs["train_validation"]
    data_test = graphs["train_test"]

    mesh = None
    if args.data_parallel:
        from artgraph_tpu.parallel import create_mesh
        mesh = create_mesh(data=args.data_parallel)

    label = args.label
    model = HeteroSGNN(metadata=data_train.metadata,
                       operator=args.operator,
                       activation=args.activation,
                       aggr='sum',
                       hidden_channels=128,
                       out_channels=config.NUM_CLASSES[label],
                       n_layers=2,
                       dropout=0.4,
                       bn=True,
                       skip=False,
                       axis_name='data' if mesh is not None else None)

    y = {name: jnp.asarray(g.labels[f"y_{label}"])
         for name, g in graphs.items()}

    rng = jax.random.PRNGKey(config.GLOBAL_SEED)
    if mesh is not None:
        from artgraph_tpu.parallel.gnn_parallel import (device_put_graph_csr,
                                                        init_variables)
        variables = init_variables(model, rng, data_train.node_features,
                                   data_train.edges, train=False)
        # kernel-backed sharded path: per-shard CSR metadata rides the mesh
        placed = {name: device_put_graph_csr(g, mesh)
                  for name, g in graphs.items()}
        feats = {name: p[0] for name, p in placed.items()}
        edges = {name: p[1] for name, p in placed.items()}
        csrs = {name: p[2] for name, p in placed.items()}
    else:
        variables = model.init(rng, data_train.node_features,
                               data_train.edges, train=False)
        feats = {name: g.node_features for name, g in graphs.items()}
        edges = {name: g.edges for name, g in graphs.items()}
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = adam(args.lr)
    opt_state = tx.init(params)

    train_step, eval_step = make_steps(model, tx, mesh)

    def save_resume(epoch):
        from artgraph_tpu.cli._common import save_resume_payload
        save_resume_payload(args.resume, jax.device_get(
            {"params": params, "batch_stats": batch_stats,
             "opt_state": opt_state}), {"epoch": epoch})

    start_epoch = 0
    if args.resume and os.path.exists(os.path.join(args.resume, "meta.json")):
        import json
        from artgraph_tpu.checkpointing import restore_checkpoint
        template = jax.device_get({"params": params,
                                   "batch_stats": batch_stats,
                                   "opt_state": opt_state})
        restored = restore_checkpoint(os.path.join(args.resume, "state"),
                                      target=template)
        params, batch_stats = restored["params"], restored["batch_stats"]
        opt_state = restored["opt_state"]
        with open(os.path.join(args.resume, "meta.json")) as f:
            start_epoch = int(json.load(f)["epoch"])
        print(f"resumed from {args.resume}: epoch {start_epoch}")

    def print_metrics(train_loss, train_acc, val_loss, val_logp):
        print(f'{label}_train_loss', round(train_loss, 4))
        print(f'{label}_train_accuracy', round(train_acc, 2) * 100)
        print(f'{label}_val_loss', round(float(val_loss), 4))
        print(f'{label}_val_accuracy',
              round(get_accuracy(np.asarray(val_logp),
                                 np.asarray(y["train_validation"])), 2) * 100)

    train_loss = train_acc = 0.0
    if args.no_epoch_scan:
        for epoch in range(start_epoch, args.epochs):
            step_rng = jax.random.fold_in(rng, epoch)
            params, batch_stats, opt_state, loss, logp = train_step(
                params, batch_stats, opt_state, step_rng,
                feats["train_train"], edges["train_train"],
                csrs["train_train"], y["train_train"])
            train_loss = float(loss)
            train_acc = get_accuracy(np.asarray(logp),
                                     np.asarray(y["train_train"]))
            val_loss, val_logp, _ = eval_step(
                params, batch_stats, feats["train_validation"],
                edges["train_validation"], csrs["train_validation"],
                y["train_validation"])
            if epoch % 5 == 0:
                print_metrics(train_loss, train_acc, val_loss, val_logp)
                if args.resume:
                    save_resume(epoch + 1)
    else:
        # 5-epoch chunks compile to ONE lax.scan program each; boundaries
        # land exactly on the print/checkpoint epochs so the output, resume
        # cadence and fold_in(rng, epoch) stream match the per-epoch loop.
        train_chunk = make_train_chunk(model, tx, mesh)
        for chunk_start, chunk_end in epoch_chunks(start_epoch, args.epochs):
            params, batch_stats, opt_state, losses, logp = train_chunk(
                params, batch_stats, opt_state, rng,
                feats["train_train"], edges["train_train"],
                csrs["train_train"], y["train_train"],
                jnp.int32(chunk_start), chunk_end - chunk_start)
            train_loss = float(losses[-1])
            train_acc = get_accuracy(np.asarray(logp),
                                     np.asarray(y["train_train"]))
            if (chunk_end - 1) % 5 == 0:
                val_loss, val_logp, _ = eval_step(
                    params, batch_stats, feats["train_validation"],
                    edges["train_validation"], csrs["train_validation"],
                    y["train_validation"])
                print_metrics(train_loss, train_acc, val_loss, val_logp)
                if args.resume:
                    save_resume(chunk_end)

    if args.resume:
        save_resume(args.epochs)

    val_loss, val_logp, _ = eval_step(
        params, batch_stats, feats["train_validation"],
        edges["train_validation"], csrs["train_validation"],
        y["train_validation"])
    test_loss, test_logp, _ = eval_step(
        params, batch_stats, feats["train_test"], edges["train_test"],
        csrs["train_test"], y["train_test"])
    print(f'{label}_train_loss', round(train_loss, 4))
    print(f'{label}_train_accuracy', round(train_acc, 2) * 100)
    print(f'{label}_val_loss', round(float(val_loss), 4))
    print(f'{label}_val_accuracy',
          round(get_accuracy(np.asarray(val_logp),
                             np.asarray(y["train_validation"])), 2) * 100)
    print(f'{label}_test_loss', round(float(test_loss), 4))
    print(f'{label}_test_accuracy',
          round(get_accuracy(np.asarray(test_logp),
                             np.asarray(y["train_test"])), 2) * 100)

    # save_embeddings (ref :82-93): eval fwd on the FULL train graph; the
    # artwork embedding is the post-BN pre-activation hidden state.
    print('Saving embeddings...')
    _, _, emb_artwork = eval_step(
        params, batch_stats, feats["train"], edges["train"], csrs["train"],
        y["train"])
    emb = np.asarray(jax.device_get(emb_artwork))
    os.makedirs(config.EMBEDDINGS_DIR, exist_ok=True)
    save_embedding(os.path.join(config.EMBEDDINGS_DIR,
                                f"test_gnn_artwork_{label}_embs.pt"), emb)
    save_embedding(os.path.join(config.EMBEDDINGS_DIR,
                                f"test_gnn_{label}_embs.pt"), emb)
    print('Saved.')


if __name__ == '__main__':
    main()
