"""GNN training-trajectory parity vs a torch hetero-GAT oracle.

Pipeline stage 1 (ref: src/train_gnn_embeddings.py) trains a
to_hetero(GATConv) stack full-batch with NLL + Adam and saves the eval-mode
artwork hidden states — those saved embeddings feed every downstream fusion
model, so their trajectory must match torch end to end: GAT attention
gradients (softmax-over-segments), to_hetero sum-aggregation, BatchNorm1d
batch-stat gradients AND the unbiased-running-var EMA (the saved embeddings
are an eval-mode forward through the running stats), NLL reduction, Adam.

The oracle reimplements PyG GATConv/to_hetero semantics with plain torch
index_add/scatter ops (PyG is not installed) and loads its parameters
directly from the flax init tree, so both frameworks start bit-identical.
f64 everywhere for the same reason as tests/test_train_trajectory.py.

The flax side runs the XLA (csr=None) path; kernel-vs-XLA equivalence of
the Pallas CSR fwd+VJPs is pinned separately in tests/test_csr_segment.py —
together the two chains pin kernel-vs-torch.
"""
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax

from artgraph_tpu.models.gnn import HeteroSGNN
from artgraph_tpu.train import nll_loss
from artgraph_tpu.train.trainer import adam

LR = 1e-2
STEPS = 5
HIDDEN = 8
OUT = 4

NODE_TYPES = ("artwork", "style", "artist")
EDGE_TYPES = (
    ("artwork", "style_rel", "style"),
    ("style", "rev_style_rel", "artwork"),
    ("artist", "artist_rel", "artwork"),
    ("artwork", "rev_artist_rel", "artist"),
)
N = {"artwork": 12, "style": 4, "artist": 3}
FEAT = {"artwork": 6, "style": 5, "artist": 4}


def _graph(seed=0):
    rng = np.random.default_rng(seed)
    x = {t: rng.normal(size=(N[t], FEAT[t])).astype(np.float32)
         for t in NODE_TYPES}
    edges = {}
    for (s, r, d) in EDGE_TYPES:
        e = 20
        edges[(s, r, d)] = np.stack([
            rng.integers(0, N[s], size=e).astype(np.int32),
            rng.integers(0, N[d], size=e).astype(np.int32)])
    y = rng.integers(0, OUT, size=N["artwork"]).astype(np.int64)
    return x, edges, y


def _flat_params(tree, prefix=""):
    """Flax param tree -> {'conv0__a__r__s/lin_src/kernel': ndarray, ...}."""
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


class TorchHeteroGAT(nn.Module):
    """Functional mirror of models.gnn.HeteroSGNN(operator='GATConv',
    aggr='sum', bn=True, dropout=0) parameterized by the flax tree."""

    def __init__(self, fparams, fstats):
        super().__init__()
        self.p = {}
        self._plist = nn.ParameterList()
        for key, arr in _flat_params(fparams).items():
            if key.startswith("bn"):
                continue
            par = nn.Parameter(torch.tensor(arr, dtype=torch.float64))
            self.p[key] = par
            self._plist.append(par)
        self.bns = nn.ModuleDict()
        for bn_name, vals in fparams.items():
            if not bn_name.startswith("bn"):
                continue
            C = vals["scale"].shape[0]
            bn = nn.BatchNorm1d(C, eps=1e-5, momentum=0.1)
            with torch.no_grad():
                bn.weight.copy_(torch.tensor(np.asarray(vals["scale"])))
                bn.bias.copy_(torch.tensor(np.asarray(vals["bias"])))
                bn.running_mean.copy_(
                    torch.tensor(np.asarray(fstats[bn_name]["mean"])))
                bn.running_var.copy_(
                    torch.tensor(np.asarray(fstats[bn_name]["var"])))
            self.bns[bn_name] = bn
        self.double()

    def _gat(self, prefix, x_src, x_dst, edge, num_dst):
        h_s = x_src @ self.p[f"{prefix}/lin_src/kernel"]
        h_d = x_dst @ self.p[f"{prefix}/lin_dst/kernel"]
        a_s = (h_s @ self.p[f"{prefix}/att_src"])[:, 0]
        a_d = (h_d @ self.p[f"{prefix}/att_dst"])[:, 0]
        src = torch.tensor(edge[0], dtype=torch.long)
        dst = torch.tensor(edge[1], dtype=torch.long)
        logits = F.leaky_relu(a_s[src] + a_d[dst], 0.2)
        with torch.no_grad():  # stability shift carries no gradient
            maxes = torch.full((num_dst,), -torch.inf, dtype=logits.dtype)
            maxes.scatter_reduce_(0, dst, logits, reduce="amax")
            maxes = torch.where(torch.isfinite(maxes),
                                maxes, torch.zeros_like(maxes))
        exp = torch.exp(logits - maxes[dst])
        denom = torch.zeros(num_dst, dtype=exp.dtype).index_add(0, dst, exp)
        att = exp / denom.clamp_min(1e-16)[dst]
        msg = att[:, None] * h_s[src]
        out = torch.zeros(num_dst, h_s.shape[1],
                          dtype=msg.dtype).index_add(0, dst, msg)
        return out + self.p[f"{prefix}/bias"]

    def _hetero(self, layer, x, edges):
        out = {t: [] for t in NODE_TYPES}
        for (s, r, d) in EDGE_TYPES:
            out[d].append(self._gat(f"{layer}__{s}__{r}__{d}",
                                    x[s], x[d], edges[(s, r, d)], N[d]))
        return {t: sum(out[t]) for t in NODE_TYPES}

    def forward(self, x, edges):
        for layer in range(2):
            new_x = self._hetero(f"conv{layer}", x, edges)
            new_x = {t: self.bns[f"bn{layer}__{t}"](v)
                     for t, v in new_x.items()}
            x = new_x  # next conv consumes PRE-activation (reference quirk)
            x_emb = {t: F.relu(v) for t, v in x.items()}
        x_out = self._hetero("conv_out", x_emb, edges)
        return x, {t: F.log_softmax(v, dim=1) for t, v in x_out.items()}


def test_hetero_gat_trajectory():
    x_np, edges_np, y_np = _graph(0)

    model = HeteroSGNN(metadata=(NODE_TYPES, EDGE_TYPES),
                       operator="GATConv", hidden_channels=HIDDEN,
                       out_channels=OUT, n_layers=2, dropout=0.0, bn=True)
    with jax.enable_x64(True):
        x64 = {t: jnp.asarray(v, jnp.float64) for t, v in x_np.items()}
        edges = {k: jnp.asarray(v) for k, v in edges_np.items()}
        y = jnp.asarray(y_np)
        variables = model.init(jax.random.PRNGKey(0), x64, edges, train=False)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a, np.float64)),
            variables["params"])
        stats = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a, np.float64)),
            variables["batch_stats"])

        # ---- torch trajectory from the SAME init --------------------------
        tmodel = TorchHeteroGAT(
            jax.tree_util.tree_map(np.asarray, variables["params"]),
            jax.tree_util.tree_map(np.asarray, variables["batch_stats"]))
        tx_np = {t: torch.tensor(v, dtype=torch.float64)
                 for t, v in x_np.items()}
        ty = torch.tensor(y_np)
        topt = torch.optim.Adam(tmodel.parameters(), lr=LR)
        tmodel.train()
        t_losses = []
        for _ in range(STEPS):
            topt.zero_grad()
            _, outs = tmodel(tx_np, edges_np)
            loss = F.nll_loss(outs["artwork"], ty)
            loss.backward()
            topt.step()
            t_losses.append(float(loss.detach()))

        # ---- flax trajectory ---------------------------------------------
        tx = adam(LR)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, stats, opt_state):
            def loss_fn(p):
                (emb, outs), mut = model.apply(
                    {"params": p, "batch_stats": stats}, x64, edges,
                    train=True, mutable=["batch_stats"])
                return nll_loss(outs[0]["artwork"], y), mut["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_stats,
                    opt_state2, loss)

        j_losses = []
        for _ in range(STEPS):
            params, stats, opt_state, loss = step(params, stats, opt_state)
            j_losses.append(float(loss))

        # rtol 1e-6 (not tighter): Adam's sign-like update amplifies the
        # f64 noise floor ~10x/step; measured drift is ~1.5e-7 by step 5
        np.testing.assert_allclose(j_losses, t_losses, rtol=1e-6)

        # ---- final parameters + BN running stats -------------------------
        flat = _flat_params(jax.tree_util.tree_map(np.asarray, params))
        for key, par in tmodel.p.items():
            np.testing.assert_allclose(
                flat[key], par.detach().numpy(), rtol=1e-6, atol=1e-8,
                err_msg=key)
        for bn_name, bn in tmodel.bns.items():
            np.testing.assert_allclose(
                flat[f"{bn_name}/scale"], bn.weight.detach().numpy(),
                rtol=1e-6, atol=1e-8, err_msg=bn_name)
            np.testing.assert_allclose(
                flat[f"{bn_name}/bias"], bn.bias.detach().numpy(),
                rtol=1e-6, atol=1e-8, err_msg=bn_name)
            # running stats inherit the ~1e-7 activation drift the param
            # tolerance already allows (BN inputs come from drifted params)
            fstats = _flat_params(jax.tree_util.tree_map(np.asarray, stats))
            np.testing.assert_allclose(
                fstats[f"{bn_name}/mean"], bn.running_mean.numpy(),
                rtol=1e-6, atol=1e-9, err_msg=f"{bn_name} running_mean")
            np.testing.assert_allclose(
                fstats[f"{bn_name}/var"], bn.running_var.numpy(),
                rtol=1e-6, atol=1e-9, err_msg=f"{bn_name} running_var")

        # ---- eval-mode artwork embedding (what save_embeddings exports) --
        tmodel.eval()
        with torch.no_grad():
            t_emb, _ = tmodel(tx_np, edges_np)
        j_emb, _ = model.apply({"params": params, "batch_stats": stats},
                               x64, edges, train=False)
        np.testing.assert_allclose(
            np.asarray(j_emb["artwork"]), t_emb["artwork"].numpy(),
            rtol=1e-6, atol=1e-9)
