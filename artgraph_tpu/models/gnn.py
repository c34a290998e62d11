"""Heterogeneous GNN in Flax — segment-op message passing over the ArtGraph KG.

Rebuilds the reference's PyG stack (HeteroGNN + to_hetero wrapper,
ref: src/models/models_graph.py:5-49) TPU-first:

  * per-relation conv parameters with sum-aggregation across relations into
    each destination type — the semantics of `to_hetero(module, metadata,
    aggr='sum')` (ref: models_graph.py:45);
  * PyG's lazy (-1, -1) bipartite shape inference (ref: models_graph.py:17)
    becomes Flax shape inference at init;
  * torch-scatter ops become jax.ops.segment_* with static segment counts
    (artgraph_tpu.ops.segment) — the whole full-batch step is one XLA program;
  * one-hot node features stay SYMBOLIC (data.artgraph.OneHot): a Linear over
    eye(N) is the weight matrix itself, so first-layer projections are
    parameter lookups, never N x N matmuls.

Reference forward quirk reproduced exactly (it defines the published
embeddings): inside the layer loop the NEXT conv consumes the post-BN
PRE-activation x; activation+dropout (x_emb) feed only the output conv, and
the returned embedding is the final post-BN x (ref: models_graph.py:25-39).

Operator registry parity (ref: train_gnn_embeddings.py:96-102): SAGEConv,
GraphConv, GATConv, GCNConv, GINConv. Notes: GCNConv requires same-dim
src/dst and no bipartite support (as in PyG — usable for HomoGNN only);
PyG's GINConv isn't constructible through the reference registry signature
(it needs an nn module, not (-1,-1)); ours takes an internal Dense so the
registry entry actually works. GAT uses no self-loops per relation (PyG's
to_hetero path requires add_self_loops=False for bipartite relations).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from artgraph_tpu.data.artgraph import OneHot
from artgraph_tpu.models.resnet import MixedBatchNorm, at_least_f32
from artgraph_tpu.ops.csr_segment import (
    csr_attention_aggregate,
    csr_gather,
    csr_segment_mean,
    csr_segment_sum,
)
from artgraph_tpu.ops.segment import (
    segment_mean,
    segment_softmax,
    segment_sum,
)

Dtype = Any


class TypedLinear(nn.Module):
    """Dense layer that treats OneHot(n) inputs as symbolic eye(n):
    the projection of an identity matrix is the kernel itself."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        if isinstance(x, OneHot):
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                (x.num, self.features), jnp.float32)
            out = kernel
        else:
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                (x.shape[-1], self.features), jnp.float32)
            # at_least_f32: f64 inputs stay f64 (trajectory-parity tests)
            out = x.astype(at_least_f32(x.dtype)) @ kernel
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias
        return out


def _rows(x) -> int:
    return x.num if isinstance(x, OneHot) else x.shape[0]


class SAGEConv(nn.Module):
    """PyG SAGEConv defaults: mean neighbor aggregation + root linear.
    out = lin_l(mean_{j in N(i)} x_src[j]) + lin_r(x_dst[i])."""

    features: int
    axis_name: str = None  # edge-sharded execution (see ops.segment)

    @nn.compact
    def __call__(self, x_src, x_dst, edge_index, num_dst: int, csr=None):
        src, dst = edge_index[0], edge_index[1]
        # project-first (linear commutes with mean); bias added post-agg
        h = TypedLinear(self.features, use_bias=False, name="lin_l")(x_src)
        if csr is not None:
            agg = csr_segment_mean(csr_gather(h, csr, "src"), csr.dst,
                                   axis_name=self.axis_name)
        else:
            agg = segment_mean(h[src], dst, num_dst, self.axis_name)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        root = TypedLinear(self.features, use_bias=False, name="lin_r")(x_dst)
        return agg + bias + root


class GraphConv(nn.Module):
    """PyG GraphConv: out = lin_rel(sum_j x_src[j]) + lin_root(x_dst)."""

    features: int
    axis_name: str = None

    @nn.compact
    def __call__(self, x_src, x_dst, edge_index, num_dst: int, csr=None):
        src, dst = edge_index[0], edge_index[1]
        h = TypedLinear(self.features, use_bias=False, name="lin_rel")(x_src)
        if csr is not None:
            agg = csr_segment_sum(csr_gather(h, csr, "src"), csr.dst,
                                  axis_name=self.axis_name)
        else:
            agg = segment_sum(h[src], dst, num_dst, self.axis_name)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        root = TypedLinear(self.features, use_bias=False, name="lin_root")(x_dst)
        return agg + bias + root


class GATConv(nn.Module):
    """PyG GATConv, heads=1, bipartite (src/dst) projections, LeakyReLU(0.2)
    attention logits, per-destination softmax."""

    features: int
    negative_slope: float = 0.2
    axis_name: str = None

    @nn.compact
    def __call__(self, x_src, x_dst, edge_index, num_dst: int, csr=None):
        src, dst = edge_index[0], edge_index[1]
        h_src = TypedLinear(self.features, use_bias=False, name="lin_src")(x_src)
        h_dst = TypedLinear(self.features, use_bias=False, name="lin_dst")(x_dst)

        att_src = self.param("att_src", nn.initializers.lecun_normal(),
                             (self.features, 1), jnp.float32)
        att_dst = self.param("att_dst", nn.initializers.lecun_normal(),
                             (self.features, 1), jnp.float32)
        alpha_dst = (h_dst @ att_dst)[:, 0]

        if csr is not None:
            # fused Pallas path (ops.csr_segment): kernel-backed gathers
            # (their VJPs are sorted segment sums, not XLA scatters) and
            # softmax numerator + denominator in one kernel pass. The src
            # attention term is computed on the gathered messages —
            # (h @ a)[src] == (h[src]) @ a — so its gradient rides the
            # message gather's VJP for free. Under edge sharding
            # (axis_name set) the aggregate psum/pmax-combines over ICI.
            # (A further-fused kernel computing the logits in-kernel was
            # built and MEASURED SLOWER — the kernels are per-chunk-latency
            # bound, see CLAUDE.md perf log — don't re-litigate.)
            msgs = csr_gather(h_src, csr, "src")
            a_src_e = (msgs @ att_src)[:, 0]
            a_dst_e = csr_gather(alpha_dst, csr, "dst")
            logits = nn.leaky_relu(a_src_e + a_dst_e,
                                   negative_slope=self.negative_slope)
            out = csr_attention_aggregate(msgs, logits, csr.dst,
                                          axis_name=self.axis_name)
        else:
            alpha_src = (h_src @ att_src)[:, 0]
            safe_dst = jnp.minimum(dst, num_dst - 1)  # padded edges
            logits = nn.leaky_relu(alpha_src[src] + alpha_dst[safe_dst],
                                   negative_slope=self.negative_slope)
            att = segment_softmax(logits, dst, num_dst, self.axis_name)
            out = segment_sum(att[:, None] * h_src[src], dst, num_dst,
                              self.axis_name)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return out + bias


class GCNConv(nn.Module):
    """PyG GCNConv (homogeneous only): symmetric-normalized aggregation with
    self-loops. Raises on bipartite use, as PyG does."""

    features: int
    add_self_loops: bool = True

    @nn.compact
    def __call__(self, x_src, x_dst, edge_index, num_dst: int, csr=None):
        # csr ignored: self-loop insertion changes the edge set (XLA path)
        if isinstance(x_src, OneHot) or isinstance(x_dst, OneHot) or \
                _rows(x_src) != num_dst:
            raise ValueError("GCNConv supports homogeneous graphs only "
                             "(PyG GCNConv has no bipartite mode)")
        src, dst = edge_index[0], edge_index[1]
        if self.add_self_loops:
            loops = jnp.arange(num_dst, dtype=src.dtype)
            src = jnp.concatenate([src, loops])
            dst = jnp.concatenate([dst, loops])
        h = TypedLinear(self.features, use_bias=False, name="lin")(x_src)
        deg = segment_sum(jnp.ones_like(src, dtype=jnp.float32), dst, num_dst)
        inv_sqrt = jnp.where(deg > 0, 1.0 / jnp.sqrt(deg), 0.0)
        norm = inv_sqrt[src] * inv_sqrt[dst]
        out = segment_sum(norm[:, None] * h[src], dst, num_dst)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return out + bias


class GINConv(nn.Module):
    """GIN aggregation with an internal Dense as the update network:
    out = Dense((1 + eps) * x_dst + sum_j x_src[j])."""

    features: int
    eps: float = 0.0
    axis_name: str = None

    @nn.compact
    def __call__(self, x_src, x_dst, edge_index, num_dst: int, csr=None):
        src, dst = edge_index[0], edge_index[1]
        h_src = TypedLinear(self.features, use_bias=False, name="lin_src")(x_src)
        h_dst = TypedLinear(self.features, use_bias=False, name="lin_dst")(x_dst)
        if csr is not None:
            agg = csr_segment_sum(csr_gather(h_src, csr, "src"), csr.dst,
                                  axis_name=self.axis_name)
        else:
            agg = segment_sum(h_src[src], dst, num_dst, self.axis_name)
        return nn.Dense(self.features, name="update")(
            (1.0 + self.eps) * h_dst + agg)


OPERATORS = {
    "SAGEConv": SAGEConv,
    "GraphConv": GraphConv,
    "GATConv": GATConv,
    "GCNConv": GCNConv,
    "GINConv": GINConv,
}

ACTIVATIONS = {
    "relu": nn.relu,
    "prelu": None,  # parameterized, handled inline
}


class HeteroSGNN(nn.Module):
    """to_hetero(HeteroGNN)-equivalent (ref: models_graph.py:41-49).

    Call with (x_dict, edge_dict, train): x_dict maps node type -> features
    (ndarray or OneHot), edge_dict maps (src, rel, dst) -> [2, E] indices.
    Returns (embedding dict, [log_softmax dict]) — the reference's
    (emb, [out_soft]) contract.
    """

    metadata: Tuple[Tuple[str, ...], Tuple[Tuple[str, str, str], ...]]
    operator: str = "GATConv"
    activation: str = "relu"
    aggr: str = "sum"
    hidden_channels: int = 128
    out_channels: int = 32
    n_layers: int = 2
    dropout: float = 0.4
    bn: bool = True
    skip: bool = False
    axis_name: str = None  # set to a mesh axis for edge-sharded execution

    def _hetero_conv(self, name: str, features: int, x: Dict, edges: Dict,
                     csr: Dict = None):
        """One to_hetero layer: per-relation conv, aggregated per dst type
        with self.aggr (PyG to_hetero semantics, ref: models_graph.py:45-49:
        sum | mean | max | min | mul)."""
        node_types, edge_types = self.metadata
        conv_cls = OPERATORS[self.operator]
        out: Dict[str, list] = {t: [] for t in node_types}
        for (src_t, rel, dst_t) in edge_types:
            conv = conv_cls(features, axis_name=self.axis_name,
                            name=f"{name}__{src_t}__{rel}__{dst_t}")
            msg = conv(x[src_t], x[dst_t], edges[(src_t, rel, dst_t)],
                       num_dst=_rows(x[dst_t]),
                       csr=None if csr is None else
                       csr.get((src_t, rel, dst_t)))
            out[dst_t].append(msg)
        combine = {
            "sum": lambda a, m: a + m,
            "mean": lambda a, m: a + m,
            "max": jnp.maximum,
            "min": jnp.minimum,
            "mul": lambda a, m: a * m,
        }[self.aggr]
        result: Dict[str, jnp.ndarray] = {}
        for t in node_types:
            if out[t]:
                acc = out[t][0]
                for m in out[t][1:]:
                    acc = combine(acc, m)
                if self.aggr == "mean":
                    acc = acc / len(out[t])
                result[t] = acc
            else:
                # PyG drops never-targeted types; zeros keep shapes total
                dt = (jnp.float32 if isinstance(x[t], OneHot)
                      else at_least_f32(x[t].dtype))
                result[t] = jnp.zeros((_rows(x[t]), features), dt)
        return result

    @nn.compact
    def __call__(self, x_dict: Dict, edge_dict: Dict, train: bool = False,
                 csr: Dict = None):
        node_types, _ = self.metadata
        x = dict(x_dict)
        x_emb = x
        for layer in range(self.n_layers):
            new_x = self._hetero_conv(f"conv{layer}", self.hidden_channels,
                                      x, edge_dict, csr=csr)
            if self.skip:
                for t in node_types:
                    new_x[t] = new_x[t] + TypedLinear(
                        self.hidden_channels, name=f"lin{layer}__{t}")(x[t])
            if self.bn:
                for t in node_types:
                    # MixedBatchNorm (apply_dtype=None = dtype-polymorphic
                    # f32 apply) rather than flax BatchNorm: torch stores the
                    # UNBIASED batch variance in running_var (flax stores the
                    # biased one), and the reference's saved embeddings are
                    # an EVAL-mode forward through those running stats
                    # (ref: train_gnn_embeddings.py:82-93) — the semantics
                    # must be torch's for checkpoint/embedding parity.
                    new_x[t] = MixedBatchNorm(
                        momentum=0.9, epsilon=1e-5, apply_dtype=None,
                        name=f"bn{layer}__{t}")(new_x[t], train=train)
            x = new_x  # next layer consumes PRE-activation (reference quirk)
            x_emb = {}
            for t in node_types:
                if self.activation == "prelu":
                    alpha = self.param(f"prelu{layer}", nn.initializers.constant(0.25),
                                       (1,), jnp.float32)
                    h = jnp.where(x[t] >= 0, x[t], alpha * x[t])
                else:
                    h = ACTIVATIONS[self.activation](x[t])
                h = nn.Dropout(self.dropout, deterministic=not train,
                               name=f"drop{layer}__{t}")(h)
                x_emb[t] = h

        x_out = self._hetero_conv("conv_out", self.out_channels, x_emb,
                                  edge_dict, csr=csr)
        out_soft = {t: nn.log_softmax(v, axis=1) for t, v in x_out.items()}
        return x, [out_soft]


class HeteroMGNN(nn.Module):
    """Three parallel hetero GNNs (artist/style/genre heads) — present in the
    reference but unused by any script (ref: models_graph.py:51-64, noted
    dead code in SURVEY.md §2.1 #9); provided for API completeness."""

    metadata: Tuple[Tuple[str, ...], Tuple[Tuple[str, str, str], ...]]
    operator: str = "GATConv"
    activation: str = "relu"
    aggr: str = "sum"
    hidden_channels: int = 128
    out_channels: Dict[str, int] = None
    n_layers: int = 2
    dropout: float = 0.4
    bn: bool = True
    skip: bool = False

    @nn.compact
    def __call__(self, x_dict: Dict, edge_dict: Dict, train: bool = False):
        outs = []
        for task in ("artist", "style", "genre"):
            gnn = HeteroSGNN(metadata=self.metadata, operator=self.operator,
                             activation=self.activation, aggr=self.aggr,
                             hidden_channels=self.hidden_channels,
                             out_channels=self.out_channels[task],
                             n_layers=self.n_layers, dropout=self.dropout,
                             bn=self.bn, skip=self.skip,
                             name=f"gnn_{task}")
            outs.append(gnn(x_dict, edge_dict, train=train))
        return outs


class HomoGNN(nn.Module):
    """Homogeneous variant (ref: models_graph.py:66-97). Same quirky dataflow
    as the reference, including dropout applied to x (not x_emb) at :95."""

    operator: str = "GCNConv"
    activation: str = "relu"
    hidden_channels: int = 16
    out_channels: int = 300
    n_layers: int = 1
    dropout: float = 0.5
    bn: bool = False
    skip: bool = False

    @nn.compact
    def __call__(self, x, edge_index, train: bool = False):
        conv_cls = OPERATORS[self.operator]
        n = x.shape[0]
        for layer in range(self.n_layers):
            h = conv_cls(self.hidden_channels, name=f"conv{layer}")(
                x, x, edge_index, num_dst=n)
            if self.skip:
                h = h + TypedLinear(self.hidden_channels,
                                    name=f"lin{layer}")(x)
            # reference always applies bn here (models_graph.py:92);
            # MixedBatchNorm for torch running-var semantics (see HeteroSGNN)
            h = MixedBatchNorm(momentum=0.9, epsilon=1e-5, apply_dtype=None,
                               name=f"bn{layer}")(h, train=train)
            x = h
        x_out = conv_cls(self.out_channels, name="conv_out")(
            x, x, edge_index, num_dst=n)
        return x, nn.log_softmax(x_out, axis=1)


class HomoSGNN(nn.Module):
    """Wrapper matching ref models_graph.py:99-106 (emb, [out_soft])."""

    operator: str = "GCNConv"
    activation: str = "relu"
    hidden_channels: int = 16
    out_channels: int = 300
    n_layers: int = 1
    dropout: float = 0.5
    bn: bool = False
    skip: bool = False

    @nn.compact
    def __call__(self, x, edge_index, train: bool = False):
        emb, out_soft = HomoGNN(
            operator=self.operator, activation=self.activation,
            hidden_channels=self.hidden_channels,
            out_channels=self.out_channels, n_layers=self.n_layers,
            dropout=self.dropout, bn=self.bn, skip=self.skip,
            name="gnn")(x, edge_index, train=train)
        return emb, [out_soft]
