"""MixedBatchNorm semantics: masked statistics for ragged batches and
torch-exact running-stat updates (unbiased running_var).

The reference trains its final batch UNPADDED (torch DataLoader default), so
BN statistics there see only real rows; our static-shape pipeline pads the
final batch and must mask the padded rows out of the statistics
(ADVICE round 1, medium).
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from artgraph_tpu.models.resnet import MixedBatchNorm, bn_batch_mask


def _init_and_apply(x, mask=None, train=True):
    bn = MixedBatchNorm(apply_dtype=jnp.float32)
    variables = bn.init(jax.random.PRNGKey(0), x, train=False)

    def run(v, x):
        ctx = bn_batch_mask(mask) if mask is not None else None
        if ctx is not None:
            with ctx:
                return bn.apply(v, x, train=train, mutable=["batch_stats"])
        return bn.apply(v, x, train=train, mutable=["batch_stats"])

    out, mut = jax.jit(run)(variables, x) if mask is None else run(variables, x)
    return np.asarray(out), jax.device_get(mut["batch_stats"])


def test_masked_stats_match_unpadded_batch():
    rng = np.random.default_rng(3)
    B, H, W, C = 8, 5, 6, 4
    valid = 5
    x_full = rng.normal(size=(B, H, W, C)).astype(np.float32)
    x_full[valid:] = 0.123  # constant padded rows, like normalized zeros
    mask = np.zeros(B, np.float32)
    mask[:valid] = 1.0

    out_masked, stats_masked = _init_and_apply(
        jnp.asarray(x_full), mask=jnp.asarray(mask))
    out_ref, stats_ref = _init_and_apply(jnp.asarray(x_full[:valid]))

    np.testing.assert_allclose(out_masked[:valid], out_ref, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(stats_masked["mean"], stats_ref["mean"],
                               rtol=1e-6)
    np.testing.assert_allclose(stats_masked["var"], stats_ref["var"],
                               rtol=1e-6)


def test_running_stats_match_torch_batchnorm():
    rng = np.random.default_rng(5)
    B, H, W, C = 4, 3, 3, 6
    x = rng.normal(loc=0.3, scale=1.7, size=(B, H, W, C)).astype(np.float32)

    _, stats = _init_and_apply(jnp.asarray(x))

    t_bn = torch.nn.BatchNorm2d(C, eps=1e-5, momentum=0.1)
    t_bn.train()
    with torch.no_grad():
        t_bn(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    np.testing.assert_allclose(stats["mean"], t_bn.running_mean.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(stats["var"], t_bn.running_var.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_trainer_uses_masked_step_on_ragged_batch():
    import flax.linen as nn
    import optax

    from artgraph_tpu.train.trainer import Trainer, accuracy_metrics
    from artgraph_tpu.train.losses import cross_entropy
    from artgraph_tpu.models.resnet import MixedBatchNorm as MBN

    class TinyBN(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(4, (3, 3), name="conv")(x)
            x = MBN(apply_dtype=jnp.float32, name="bn")(x, train=train)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(3, name="head")(x)

    def fwd(images, batch):
        return (images,)

    def loss_fn(outputs, batch):
        labels, mask = batch[1], batch[2]
        loss = cross_entropy(outputs, labels, mask=mask)
        return loss, accuracy_metrics(outputs, labels, mask)

    trainer = Trainer(TinyBN(), optax.adam(1e-3), fwd, loss_fn)

    def loader():
        rng = np.random.default_rng(0)
        for n_valid in (4, 4, 2):  # final batch ragged: 2 of 4 valid
            imgs = rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
            imgs[n_valid:] = 0
            labels = rng.integers(0, 3, (4,)).astype(np.int32)
            mask = np.zeros(4, np.float32)
            mask[:n_valid] = 1.0
            yield imgs, labels, mask

    state = trainer.init(next(iter(loader())))
    state, metrics = trainer.train_epoch(state, loader())
    assert trainer._train_step_masked is not None, (
        "ragged batch did not take the masked-BN step")
    assert np.isfinite(metrics["loss"])
    assert metrics["examples"] == 10.0
