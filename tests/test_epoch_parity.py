"""Epoch-scale production-policy parity vs the torch f32 oracle (slow tier).

The f64 trajectory tests (test_train_trajectory.py) prove 5-step semantic
equivalence, and test_bf16_policy.py bounds 10-step bf16-vs-f32 drift — but
nothing showed the FULL production pipeline (bf16 compute, MixedBatchNorm
one-pass statistics, fused uint8 normalize) and a torch f32 reference reach
the same test-set DECISIONS after real multi-epoch training. This is the
last parity instrument buildable without the real ArtGraph dataset (the
±0.5% top-1 north star itself needs real data + pretrained trunks; see
RUNBOOK). Ref oracle loop: /root/reference/src/train_baseline.py:55-66,
139-140.

REGIME NOTE (why the warmup): the reference fine-TUNES pretrained trunks
(ref src/models/models.py:51-53) — small steps near a minimum. Training
ResNet50 from RANDOM init at Adam(1e-3) is chaotic: measured here, after 14
epochs both frameworks reach 0.75 test accuracy but with ORTHOGONAL errors
(argmax agreement 0.5) because the class-boundary placement diverges with
any rounding difference — that is a property of chaos at random init, not
of the semantics under test (which the f64 5-step instrument already pins
to rtol 1e-6). So this test reproduces the reference's fine-tuning regime:
a shared f32 warmup from the identical imported init produces one common
semi-converged state, then BOTH frameworks train PHASE2_EPOCHS epochs from
it under their production policies (jax: bf16 + fused normalize + MixedBN;
torch: f32) with fresh Adam, identical batch schedules, dropout 0.

Committed bounds (measured: torch 1.0 / jax-bf16 0.875, agreement 7/8;
jax-f32 phase 2 = torch's EXACT decisions): |test-acc gap| <= 0.125 (one
image), argmax agreement >= 0.75, and BOTH accuracies >= 0.75 (3x chance)
so the asserts cannot pass on two equally-broken runs.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax

from artgraph_tpu import config
from artgraph_tpu import models as m
from artgraph_tpu.checkpointing.torch_interop import (
    export_model_state,
    import_model_state,
)
from artgraph_tpu.data import prepare_raw_dataset
from artgraph_tpu.data.datasets import ArtGraphSingleTask
from artgraph_tpu.ops.preprocess import normalize_images
from artgraph_tpu.train import cross_entropy
from artgraph_tpu.train.trainer import adam

from _torch_oracles import ResNet50Oracle

WARMUP_EPOCHS = 10  # shared f32 warmup -> the "pretrained" common state
PHASE2_EPOCHS = 8   # >=3 per the plan: the dual-framework production phase
                    # (8, not 4: the bf16 side converges slower on the two
                    # boundary images — measured 0.625 at 4 epochs vs 0.875
                    # at 8; the f32 jax side reaches torch's EXACT perfect
                    # decisions already at 4, pinning decision-level
                    # semantics — the residual gap is bf16 convergence
                    # speed, not semantics)
BATCH = 8
LR = 1e-3     # warmup: converge fast from random init
LR_FT = 1e-4  # phase 2: FINE-TUNING rate. Measured: a fresh Adam at 1e-3
              # kicks every param ~±lr (sign-like first updates) and
              # destroys the warm state in 12 steps on BOTH frameworks
              # (both collapse to constant predictions); at 1e-4 both
              # improve from the common state and stay aligned.
N_CLASS = 4  # styles in the fixture

ACC_GAP_TOL = 0.125       # one test image of slack
AGREEMENT_FLOOR = 0.75    # measured 7/8; one image of slack
ACC_FLOOR = 0.75          # measured 1.0 / 0.875; 3x the 0.25 chance


def _split_arrays(ds_dir, img_dir, split):
    df = prepare_raw_dataset(ds_dir, split)
    ds = ArtGraphSingleTask(img_dir, df[["image", "style"]])
    imgs, labels = ds.get_batch(np.arange(len(ds)))
    return imgs, np.asarray(labels, np.int64)


def _torch_normalize(imgs_u8):
    """Bit-identical to ops.preprocess.normalize_images' f32 math."""
    mean, std = config.NORM_STATS["resnet"]
    alpha = (1.0 / (255.0 * np.asarray(std, np.float32)))
    beta = (-np.asarray(mean, np.float32) / np.asarray(std, np.float32))
    x = imgs_u8.astype(np.float32) * alpha + beta
    return torch.tensor(x.transpose(0, 3, 1, 2))


def _schedule(n, epochs, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(epochs):
        perm = rng.permutation(n)
        out.append([perm[i:i + BATCH] for i in range(0, n, BATCH)])
    return out


def _jax_train(model, variables, train_imgs, train_y, schedule, lr=LR):
    params, stats = variables["params"], variables["batch_stats"]
    tx = adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, imgs_u8, labels):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats},
                normalize_images(imgs_u8, "resnet"), train=True,
                mutable=["batch_stats"])
            return cross_entropy(out, labels), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state

    for epoch in schedule:
        for idx in epoch:
            params, stats, opt_state = step(
                params, stats, opt_state, jnp.asarray(train_imgs[idx]),
                jnp.asarray(train_y[idx].astype(np.int32)))
    return {"params": jax.tree_util.tree_map(np.asarray, params),
            "batch_stats": jax.tree_util.tree_map(np.asarray, stats)}


def run_parity(ds_dir, img_dir):
    train_imgs, train_y = _split_arrays(ds_dir, img_dir, "train")
    test_imgs, test_y = _split_arrays(ds_dir, img_dir, "test")
    n = len(train_y)

    # ---- identical random init, exported through torch_interop (the
    # pretrained-import code path) ----
    torch.manual_seed(0)
    oracle = ResNet50Oracle()

    class TorchModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.resnet = nn.Sequential(
                oracle.conv1, oracle.bn1, oracle.relu, oracle.maxpool,
                oracle.layer1, oracle.layer2, oracle.layer3, oracle.layer4,
                oracle.avgpool)
            self.classifier = nn.Sequential(nn.Dropout(0.0),
                                            nn.Linear(2048, N_CLASS))

        def forward(self, x):
            return self.classifier(torch.flatten(self.resnet(x), 1))

    tmodel = TorchModel()
    sd0 = {k: v.detach().cpu().numpy().copy()
           for k, v in tmodel.state_dict().items()}

    # ---- shared f32 warmup on the jax side -> the common semi-converged
    # state both production phases start from (the fine-tuning regime) ----
    jmodel_f32 = m.ResnetSingleTask(num_class=N_CLASS, dropout=0.0,
                                    dtype=jnp.float32)
    warm = _jax_train(jmodel_f32, import_model_state("ResnetSingleTask", sd0),
                      train_imgs, train_y,
                      _schedule(n, WARMUP_EPOCHS, seed=11))
    sd_warm = export_model_state("ResnetSingleTask", warm)

    phase2 = _schedule(n, PHASE2_EPOCHS, seed=12)

    # ---- torch f32 production phase from the common state ----
    tmodel.load_state_dict(
        {k: torch.tensor(v) for k, v in sd_warm.items()}, strict=False)
    opt = torch.optim.Adam(tmodel.parameters(), lr=LR_FT)
    tmodel.train()
    for epoch in phase2:
        for idx in epoch:
            opt.zero_grad()
            out = tmodel(_torch_normalize(train_imgs[idx]))
            F.cross_entropy(out, torch.tensor(train_y[idx])).backward()
            opt.step()
    tmodel.eval()
    with torch.no_grad():
        t_pred = tmodel(_torch_normalize(test_imgs)).numpy().argmax(-1)
    t_acc = float((t_pred == test_y).mean())

    # ---- jax bf16 PRODUCTION phase from the same common state: bf16
    # compute, MixedBN one-pass stats, fused uint8 normalize ----
    jmodel = m.ResnetSingleTask(num_class=N_CLASS, dropout=0.0)
    final = _jax_train(jmodel, warm, train_imgs, train_y, phase2,
                       lr=LR_FT)

    @jax.jit
    def eval_logits(variables, imgs_u8):
        return jmodel.apply(variables, normalize_images(imgs_u8, "resnet"),
                            train=False)

    j_logits = np.asarray(
        eval_logits({"params": final["params"],
                     "batch_stats": final["batch_stats"]},
                    jnp.asarray(test_imgs)), np.float32)
    j_pred = j_logits.argmax(-1)
    j_acc = float((j_pred == test_y).mean())

    return {"torch_acc": t_acc, "jax_acc": j_acc,
            "agreement": float((t_pred == j_pred).mean()),
            "torch_pred": t_pred.tolist(), "jax_pred": j_pred.tolist(),
            "test_y": test_y.tolist()}


def test_epoch_scale_production_policy_parity(synthetic_dataset):
    res = run_parity(synthetic_dataset["dataset_dir"],
                     synthetic_dataset["image_dir"])
    assert abs(res["jax_acc"] - res["torch_acc"]) <= ACC_GAP_TOL, res
    assert res["agreement"] >= AGREEMENT_FLOOR, res
    assert res["jax_acc"] >= ACC_FLOOR and res["torch_acc"] >= ACC_FLOOR, res
