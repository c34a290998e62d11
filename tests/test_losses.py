"""Losses must match torch criterion semantics exactly (torch-cpu as oracle)."""
import numpy as np
import torch

from artgraph_tpu.train import losses


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(16, 7)).astype(np.float32)
    labels = rng.integers(0, 7, size=16).astype(np.int32)

    ours = float(losses.cross_entropy(logits, labels))
    theirs = torch.nn.CrossEntropyLoss()(
        torch.tensor(logits), torch.tensor(labels, dtype=torch.long)).item()
    assert abs(ours - theirs) < 5e-5


def test_weighted_cross_entropy_matches_torch():
    # torch divides by the sum of sample weights, not batch size
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(10, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=10).astype(np.int32)
    weights = rng.uniform(0.5, 2.0, size=5).astype(np.float32)

    ours = float(losses.cross_entropy(logits, labels, class_weights=weights))
    theirs = torch.nn.CrossEntropyLoss(weight=torch.tensor(weights))(
        torch.tensor(logits), torch.tensor(labels, dtype=torch.long)).item()
    assert abs(ours - theirs) < 1e-5


def test_cross_entropy_mask_ignores_padding():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(8, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=8).astype(np.int32)
    mask = np.array([1, 1, 1, 1, 1, 0, 0, 0], dtype=np.float32)

    masked = float(losses.cross_entropy(logits, labels, mask=mask))
    trimmed = float(losses.cross_entropy(logits[:5], labels[:5]))
    assert abs(masked - trimmed) < 1e-6


def test_smooth_l1_matches_torch():
    rng = np.random.default_rng(3)
    pred = rng.normal(size=(6, 12)).astype(np.float32) * 3
    target = rng.normal(size=(6, 12)).astype(np.float32)

    ours = float(losses.smooth_l1(pred, target))
    theirs = torch.nn.SmoothL1Loss()(
        torch.tensor(pred), torch.tensor(target)).item()
    assert abs(ours - theirs) < 1e-6


def test_mse_matches_torch():
    rng = np.random.default_rng(4)
    pred = rng.normal(size=(6, 12)).astype(np.float32)
    target = rng.normal(size=(6, 12)).astype(np.float32)

    ours = float(losses.mse(pred, target))
    theirs = torch.nn.MSELoss()(
        torch.tensor(pred), torch.tensor(target)).item()
    assert abs(ours - theirs) < 1e-6


def test_nll_loss_matches_torch():
    rng = np.random.default_rng(5)
    logits = rng.normal(size=(9, 6)).astype(np.float32)
    logp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    labels = rng.integers(0, 6, size=9).astype(np.int32)

    ours = float(losses.nll_loss(logp, labels))
    theirs = torch.nn.functional.nll_loss(
        torch.tensor(logp), torch.tensor(labels, dtype=torch.long)).item()
    assert abs(ours - theirs) < 1e-5
