"""Training-trajectory parity vs the torch oracles (VERDICT round-2 #2).

The reference's published accuracies are the product of fine-TUNING
(ref: src/models/models.py:51-53,97 load pretrained trunks and train end to
end), so forward parity alone does not back the ±0.5% accuracy north star:
CE gradients, Adam bias-correction/eps semantics, BN batch-statistics
gradients and running-stat EMA updates all shape the trajectory. Real-data
runs are impossible in this container, so the strongest evidence it can
produce is k-step training-trajectory equivalence: identical init (imported
through checkpointing.torch_interop), identical batches, dropout 0 —
assert per-step losses and final parameters track torch.optim.Adam +
torch.nn.CrossEntropyLoss on the oracle models.

WHY f64: in f32 the two frameworks' conv summation orders differ by ~1e-5,
which flips ReLU masks at near-zero activations and discretely reroutes
gradients (~3% trunk-grad noise measured) — amplified chaotically by Adam's
sign-like update. That noise is a property of f32, not of the semantics
under test. In f64 forward differences are ~1e-13, no masks flip, and any
REAL semantic mismatch (Adam eps placement, BN momentum/unbiased-var, CE
reduction, dropout placement) still produces first-order divergence. The
models are dtype-polymorphic (models.resnet.at_least_f32) precisely so this
instrument exists.

Covered trajectories (5 optimizer steps each):
  ResnetSingleTask      — CE grads, Adam, BN batch-stat grads + running EMA
  ViTSingleTask         — LN/attention/GELU grads through a deep residual net
  NewMultiModalMultiTask — multi-task summed CE over concat(visual, embedding)
  ContextNetSingleTask  — SGD(momentum 0.9) + joint 0.9*CE + 0.1*SmoothL1
                          loss (ref: src/train_baseline_context.py:47-54) —
                          the one reference trainer that is NOT Adam+CE
(The GNN stage's trajectory parity lives in tests/test_gnn_trajectory.py.)
"""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax

from artgraph_tpu.checkpointing.torch_interop import (
    export_model_state,
    import_model_state,
)
from artgraph_tpu import models as m
from artgraph_tpu.train import cross_entropy, smooth_l1
from artgraph_tpu.train.trainer import adam, sgd_momentum

from _torch_oracles import ResNet50Oracle, ViTOracle, randomize_bn_stats

LR = 1e-3
STEPS = 5


def _seq_trunk(oracle: ResNet50Oracle) -> nn.Sequential:
    """nn.Sequential(*children[:-1]) — exactly the reference's trunk wrap
    (ref: src/models/models.py:53), producing the resnet.0..7 key layout."""
    return nn.Sequential(oracle.conv1, oracle.bn1, oracle.relu,
                         oracle.maxpool, oracle.layer1, oracle.layer2,
                         oracle.layer3, oracle.layer4, oracle.avgpool)


def _np_sd(model: nn.Module) -> dict:
    return {k: v.detach().cpu().numpy().copy()
            for k, v in model.state_dict().items()}


def _torch_trajectory(model: nn.Module, batches, loss_of, opt_factory=None):
    """Run STEPS optimizer steps in f64; return per-step losses + state."""
    model.double()
    if opt_factory is None:
        opt_factory = lambda ps: torch.optim.Adam(ps, lr=LR)
    opt = opt_factory(model.parameters())
    model.train()
    losses = []
    for batch in batches:
        opt.zero_grad()
        loss = loss_of(model, batch)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses, _np_sd(model)


def _jax_trajectory(model, variables, batches, loss_of, tx=None,
                    n_model_args=None):
    """Mirror of _torch_trajectory on the flax side (jitted f64 step).

    n_model_args: how many leading batch elements the model consumes
    (default: all but the last — extra trailing elements, e.g. regression
    targets, are visible to loss_of via the full batch)."""
    with jax.enable_x64(True):
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a, np.float64)),
            variables["params"])
        stats = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a, np.float64)),
            variables.get("batch_stats", {}))
        if tx is None:
            tx = adam(LR)
        opt_state = tx.init(params)
        has_bn = bool(stats)

        @jax.jit
        def step(params, stats, opt_state, batch):
            n_in = len(batch) - 1 if n_model_args is None else n_model_args

            def loss_fn(p):
                v = {"params": p}
                if has_bn:
                    v["batch_stats"] = stats
                    out, mut = model.apply(v, *batch[:n_in], train=True,
                                           mutable=["batch_stats"])
                    new_stats = mut["batch_stats"]
                else:
                    out = model.apply(v, *batch[:n_in], train=True)
                    new_stats = stats
                return loss_of(out, batch), new_stats

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_stats,
                    opt_state, loss)

        losses = []
        for batch in batches:
            batch = tuple(
                jnp.asarray(b, jnp.float64) if b.dtype.kind == "f"
                else jnp.asarray(b) for b in batch)
            params, stats, opt_state, loss = step(params, stats, opt_state,
                                                  batch)
            losses.append(float(loss))
        out = {"params": jax.tree_util.tree_map(np.asarray, params)}
        if has_bn:
            out["batch_stats"] = jax.tree_util.tree_map(np.asarray, stats)
    return losses, out


def _compare_state(model_name, flax_variables, torch_sd,
                   rtol=1e-5, atol=5e-6):
    """Exported flax state must match the torch state tensor by tensor.

    Adam's update is sign-like (m̂/√v̂ ≈ ±1 regardless of |g|), so a
    parameter whose true gradient sits at f64 noise level can receive a
    full ±lr step in opposite directions in the two frameworks. Allow a
    few such outliers per million elements, each bounded by the maximum
    possible Adam drift (2·STEPS·LR); everything else must match tightly."""
    back = export_model_state(model_name, flax_variables)
    for k, v in torch_sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        a, b = back[k], np.asarray(v, np.float32)
        diff = np.abs(a - b)
        tol = atol + rtol * np.abs(b)
        bad = diff > tol
        n_bad = int(bad.sum())
        assert n_bad <= max(8, int(5e-6 * a.size)), (
            f"{k}: {n_bad}/{a.size} elements beyond rtol={rtol}/atol={atol} "
            f"(max diff {diff.max():.3e})")
        if n_bad:
            assert float(diff[bad].max()) <= 2 * STEPS * LR, (
                f"{k}: outlier diff {diff[bad].max():.3e} exceeds the "
                f"possible Adam drift bound {2 * STEPS * LR:.1e}")


def _make_batches(rng, shapes_and_dtypes):
    """STEPS batches of identical synthetic data for both frameworks.

    Float data is generated in f32 (exactly representable in f64) so both
    frameworks consume bit-identical values."""
    batches = []
    for _ in range(STEPS):
        batch = []
        for shape, kind, hi in shapes_and_dtypes:
            if kind == "img":
                batch.append(rng.normal(size=shape).astype(np.float32))
            else:
                batch.append(rng.integers(0, hi, size=shape).astype(np.int64))
        batches.append(tuple(batch))
    return batches


def _timg(b):
    return torch.tensor(b.transpose(0, 3, 1, 2)).double()


def test_resnet_single_task_trajectory():
    torch.manual_seed(0)
    oracle = ResNet50Oracle()
    randomize_bn_stats(oracle, seed=3)

    class TorchModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.resnet = _seq_trunk(oracle)
            self.classifier = nn.Sequential(nn.Dropout(0.0),
                                            nn.Linear(2048, 7))

        def forward(self, x):
            return self.classifier(torch.flatten(self.resnet(x), 1))

    tmodel = TorchModel()
    sd0 = _np_sd(tmodel)

    rng = np.random.default_rng(0)
    batches = _make_batches(rng, [((4, 64, 64, 3), "img", None),
                                  ((4,), "label", 7)])

    t_losses, t_final = _torch_trajectory(
        tmodel, batches,
        lambda mm, b: F.cross_entropy(mm(_timg(b[0])), torch.tensor(b[1])))

    jmodel = m.ResnetSingleTask(num_class=7, dropout=0.0, dtype=jnp.float64)
    variables = import_model_state("ResnetSingleTask", sd0)
    j_losses, j_final = _jax_trajectory(
        jmodel, variables, batches,
        lambda out, b: cross_entropy(out, b[-1].astype(jnp.int32)))

    np.testing.assert_allclose(j_losses, t_losses, rtol=1e-6)
    _compare_state("ResnetSingleTask", j_final, t_final)


def test_vit_single_task_trajectory():
    torch.manual_seed(1)
    oracle = ViTOracle(depth=12, img=96)
    oracle.head = nn.Sequential(nn.Dropout(0.0), nn.Linear(768, 7))

    class TorchModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.vit = oracle

        def forward(self, x):
            return self.vit.head(self.vit.forward_features(x))

    tmodel = TorchModel()
    sd0 = _np_sd(tmodel)

    rng = np.random.default_rng(1)
    batches = _make_batches(rng, [((2, 96, 96, 3), "img", None),
                                  ((2,), "label", 7)])

    t_losses, t_final = _torch_trajectory(
        tmodel, batches,
        lambda mm, b: F.cross_entropy(mm(_timg(b[0])), torch.tensor(b[1])))

    jmodel = m.ViTSingleTask(num_class=7, dropout=0.0, dtype=jnp.float64)
    variables = import_model_state("ViTSingleTask", sd0)
    j_losses, j_final = _jax_trajectory(
        jmodel, variables, batches,
        lambda out, b: cross_entropy(out, b[-1].astype(jnp.int32)))

    np.testing.assert_allclose(j_losses, t_losses, rtol=1e-6)
    _compare_state("ViTSingleTask", j_final, t_final)


def test_new_multimodal_multitask_trajectory():
    torch.manual_seed(2)
    oracle = ResNet50Oracle()
    randomize_bn_stats(oracle, seed=5)
    EMB = 16

    class TorchModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.resnet = _seq_trunk(oracle)
            self.class_style = nn.Sequential(nn.Dropout(0.0),
                                             nn.Linear(2048 + EMB, 7))
            self.class_genre = nn.Sequential(nn.Dropout(0.0),
                                             nn.Linear(2048 + EMB, 5))

        def forward(self, x, es, eg):
            f = torch.flatten(self.resnet(x), 1)
            return (self.class_style(torch.cat([f, es], 1)),
                    self.class_genre(torch.cat([f, eg], 1)))

    tmodel = TorchModel()
    sd0 = _np_sd(tmodel)

    rng = np.random.default_rng(2)
    batches = _make_batches(rng, [((4, 64, 64, 3), "img", None),
                                  ((4, EMB), "img", None),
                                  ((4, EMB), "img", None),
                                  ((4, 2), "label", 5)])

    def t_loss(mm, b):
        outs = mm(_timg(b[0]), torch.tensor(b[1]).double(),
                  torch.tensor(b[2]).double())
        y = torch.tensor(b[3])
        # reference multitask loss: summed per-task CE
        # (ref: src/train_baseline_multitask.py:62-66)
        return (F.cross_entropy(outs[0], y[:, 0])
                + F.cross_entropy(outs[1], y[:, 1]))

    t_losses, t_final = _torch_trajectory(tmodel, batches, t_loss)

    jmodel = m.NewMultiModalMultiTask(
        emb_size=EMB, num_classes={"style": 7, "genre": 5}, dropout=0.0,
        dtype=jnp.float64)
    variables = import_model_state("NewMultiModalMultiTask", sd0)

    def j_loss(outs, b):
        y = b[-1].astype(jnp.int32)
        return (cross_entropy(outs[0], y[:, 0])
                + cross_entropy(outs[1], y[:, 1]))

    j_losses, j_final = _jax_trajectory(jmodel, variables, batches, j_loss)

    np.testing.assert_allclose(j_losses, t_losses, rtol=1e-6)
    _compare_state("NewMultiModalMultiTask", j_final, t_final)


def test_contextnet_sgd_smoothl1_trajectory():
    """ContextNet is the one reference trainer that is NOT Adam + CE:
    SGD(momentum=0.9) on the joint loss 0.9*CE(out, y) +
    0.1*SmoothL1(graph_proj, emb) (ref: src/train_baseline_context.py:47-54).
    Pins optax.sgd's trace-form momentum against torch.optim.SGD and the
    SmoothL1 (huber beta=1) piecewise gradient."""
    torch.manual_seed(3)
    oracle = ResNet50Oracle()
    randomize_bn_stats(oracle, seed=7)
    EMB = 16
    LAM = 0.9
    # smaller LR than the Adam tests: at 1e-3 this SGD trajectory is
    # UNSTABLE on the random-init heads (loss bounces 1.1 -> 3.5) and
    # Lyapunov growth amplifies even the f64 noise floor ~30x/step past
    # rtol by step 4; at 1e-4 the trajectory is stable and any real
    # semantic mismatch still shows up at first order.
    SGD_LR = 1e-4

    class TorchModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.resnet = _seq_trunk(oracle)
            self.classifier = nn.Linear(2048, 7)
            self.encoder = nn.Linear(2048, EMB)

        def forward(self, x):
            f = torch.flatten(self.resnet(x), 1)
            return self.classifier(f), self.encoder(f)

    tmodel = TorchModel()
    sd0 = _np_sd(tmodel)

    rng = np.random.default_rng(3)
    batches = _make_batches(rng, [((4, 64, 64, 3), "img", None),
                                  ((4, EMB), "img", None),
                                  ((4,), "label", 7)])

    def t_loss(mm, b):
        out, proj = mm(_timg(b[0]))
        return (LAM * F.cross_entropy(out, torch.tensor(b[2]))
                + (1 - LAM) * F.smooth_l1_loss(
                    proj, torch.tensor(b[1]).double()))

    t_losses, t_final = _torch_trajectory(
        tmodel, batches, t_loss,
        opt_factory=lambda ps: torch.optim.SGD(ps, lr=SGD_LR, momentum=0.9))

    jmodel = m.ContextNetSingleTask(emb_size=EMB, num_class=7,
                                    dtype=jnp.float64)
    variables = import_model_state("ContextNetSingleTask", sd0)

    def j_loss(outs, b):
        out, proj = outs
        return (LAM * cross_entropy(out, b[2].astype(jnp.int32))
                + (1 - LAM) * smooth_l1(proj, b[1]))

    j_losses, j_final = _jax_trajectory(
        jmodel, variables, batches, j_loss,
        tx=sgd_momentum(SGD_LR, 0.9), n_model_args=1)

    np.testing.assert_allclose(j_losses, t_losses, rtol=1e-6)
    _compare_state("ContextNetSingleTask", j_final, t_final)
