"""Production-dtype-policy drift bound (PARITY.md deviation 6).

The reference fine-tunes under fp16 autocast (ref:
src/train_baseline.py:61-66); our production policy is bf16 compute with f32
params/BN-stats/logits/losses. Every torch-trajectory parity test runs in
f64, so this is the one instrument that pins the POLICY itself: k identical
Adam steps (same init, same batches, same dropout rng) under bf16-compute vs
all-f32-compute must track each other within the committed tolerances below.
A policy regression (e.g. bf16 BN statistics, bf16 loss reduction, params
cast to bf16) blows the bound.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artgraph_tpu.train.trainer import Trainer, adam

K_STEPS = 10
N_CLASS = 4

# Committed drift tolerances: per-step relative loss gap and final-params
# relative l2 gap. Measured drift (1-core CPU host, 10 steps): resnet loss
# rel <= 0.115, vit <= ~0.1; a POLICY regression (bf16 BN statistics, bf16
# loss reduction, params cast to bf16) produces O(1) deviations.
LOSS_RTOL = {"resnet": 0.2, "vit": 0.2}
PARAM_RTOL = {"resnet": 0.1, "vit": 0.1}


def _batches(batch_size, size=224):
    """K deterministic uint8 batches + all-ones masks.

    Noise images with RANDOM labels on purpose: losses then stay O(1) over
    the window, so the relative drift measures the dtype policy. (On
    class-structured batches the model converges to ~1e-3 loss within 10
    steps and the near-zero trajectories diverge chaotically — that measures
    memorization noise, not bf16.)"""
    rng = np.random.default_rng(42)
    batches = []
    for step in range(K_STEPS):
        imgs = rng.integers(0, 256, size=(batch_size, size, size, 3),
                            dtype=np.uint8)
        labels = rng.integers(0, N_CLASS, size=batch_size).astype(np.int32)
        mask = np.ones(batch_size, np.float32)
        batches.append((imgs, labels, mask))
    return batches


def _run(model, batches):
    """K production train steps; per-step losses + final params."""
    from artgraph_tpu.cli._common import single_task_loss

    trainer = Trainer(model=model, optimizer=adam(3e-4),
                      forward_inputs=lambda img, batch: (img,),
                      compute_loss=single_task_loss(None),
                      transform_type="resnet", seed=1)
    state = trainer.init(batches[0])
    losses = []
    for b in batches:
        # one-batch epochs -> train_epoch's mean loss IS the step loss
        state, m = trainer.train_epoch(state, [b])
        losses.append(m["loss"])
    return np.asarray(losses), jax.device_get(state.params)


def _rel_l2(tree_a, tree_b):
    num = den = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                    jax.tree_util.tree_leaves(tree_b)):
        num += float(np.sum((np.asarray(a, np.float64)
                             - np.asarray(b, np.float64)) ** 2))
        den += float(np.sum(np.asarray(b, np.float64) ** 2))
    return (num / max(den, 1e-30)) ** 0.5


def _assert_drift(name, make_model, batch_size):
    batches = _batches(batch_size)
    losses_bf16, params_bf16 = _run(make_model(jnp.bfloat16), batches)
    losses_f32, params_f32 = _run(make_model(jnp.float32), batches)

    rel = np.abs(losses_bf16 - losses_f32) / np.maximum(losses_f32, 1.0)
    prel = _rel_l2(params_bf16, params_f32)
    print(f"{name}: max step-loss rel drift {rel.max():.4g}, "
          f"params rel-l2 {prel:.4g}")
    assert np.all(rel < LOSS_RTOL[name]), (
        f"{name}: bf16 step losses drifted beyond "
        f"{LOSS_RTOL[name]}: rel={rel}, bf16={losses_bf16}, f32={losses_f32}")
    # sanity: both policies stay at ordinary CE magnitudes (a broken policy
    # NaNs or explodes within a few steps)
    for losses in (losses_f32, losses_bf16):
        assert np.all(np.isfinite(losses)) and np.all(losses < 10.0), losses
    assert prel < PARAM_RTOL[name], (
        f"{name}: final params rel-l2 {prel} exceeds {PARAM_RTOL[name]}")


def test_bf16_policy_drift_resnet():
    from artgraph_tpu.models import ResnetSingleTask

    _assert_drift("resnet",
                  lambda dt: ResnetSingleTask(N_CLASS, 0.4, dtype=dt),
                  batch_size=8)


def test_bf16_policy_drift_vit():
    from artgraph_tpu.models import ViTSingleTask

    _assert_drift("vit",
                  lambda dt: ViTSingleTask(N_CLASS, 0.4, dtype=dt),
                  batch_size=4)
