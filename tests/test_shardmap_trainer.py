"""The shard_map DP train/eval step must match single-device numerics
EXACTLY: global losses from psum'd weighted sums (class weights, ragged
masks), global BN statistics via bn_psum_axis, psum'd gradients.

(The auto-sharded-jit path it replaces computed all of these globally by
construction; this pins that the explicit per-shard formulation is the
same function.)
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artgraph_tpu.models.resnet import MixedBatchNorm
from artgraph_tpu.parallel.mesh import create_mesh
from artgraph_tpu.train import cross_entropy
from artgraph_tpu.train.trainer import Trainer, accuracy_metrics, adam


class TinyBNModel(nn.Module):
    """Conv + MixedBatchNorm + head: exercises BN stats, grads, metrics."""

    num_class: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        # use_bias=False as in production ResNet: a bias feeding BN has a
        # mathematically zero gradient, and Adam amplifies its float noise
        # into sign-level update differences between execution orders
        x = nn.Conv(8, (3, 3), use_bias=False, dtype=jnp.float32)(x)
        x = MixedBatchNorm(apply_dtype=jnp.float32, name="bn")(x, train=train)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_class)(x)


def _batch(b=16, seed=0, ragged=False):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, (b, 8, 8, 3), dtype=np.uint8)
    labels = rng.integers(0, 5, (b,)).astype(np.int32)
    mask = np.ones((b,), np.float32)
    if ragged:
        mask[b // 2:] = 0.0
    return (images, labels, mask)


CLASS_WEIGHTS = jnp.asarray(np.linspace(0.5, 2.0, 5), jnp.float32)


def _fwd(images, batch):
    return (images,)


def _loss(outputs, batch):
    labels, mask = batch[1], batch[2]
    # class weights make per-shard weight sums UNequal — the case a naive
    # pmean-of-local-losses would get wrong
    loss = cross_entropy(outputs, labels, class_weights=CLASS_WEIGHTS,
                         mask=mask)
    return loss, accuracy_metrics(outputs, labels, mask)


def _make_trainer(mesh):
    return Trainer(TinyBNModel(), adam(1e-2), _fwd, _loss, mesh=mesh)


@pytest.fixture(scope="module", params=[8, 4])
def mesh(request):
    devices = jax.devices()[:request.param]
    return create_mesh(data=request.param, model=1, devices=devices)


def test_shardmap_train_step_matches_single_device(mesh):
    batch = _batch()
    single = _make_trainer(None)
    sharded = _make_trainer(mesh)

    s0 = single.init(batch)
    s1 = sharded.init(batch)

    step_s = single._build_train_step(has_bn=True)
    step_m = sharded._build_train_step(has_bn=True)
    rng = jax.random.PRNGKey(7)

    for i in range(3):
        s0, m0 = step_s(s0, rng, *single._put(batch))
        s1, m1 = step_m(s1, rng, *sharded._put(batch))

    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["correct"]), float(m0["correct"]))
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s0.params),
            jax.tree_util.tree_leaves_with_path(s1.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s0.batch_stats),
            jax.tree_util.tree_leaves_with_path(s1.batch_stats)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"bn {jax.tree_util.keystr(pa)}")


def test_shardmap_eval_matches_single_device_ragged(mesh):
    """Eval on a ragged masked batch: per-shard weight sums differ (half the
    shards are fully masked) — psum'd num/den must still give the exact
    global mean and correct-count."""
    batch = _batch(ragged=True, seed=3)
    single = _make_trainer(None)
    sharded = _make_trainer(mesh)

    state = single.init(batch)
    ev_s = single._build_eval_step(has_bn=True)
    ev_m = sharded._build_eval_step(has_bn=True)

    out_s, m_s = ev_s(state, *single._put(batch))
    out_m, m_m = ev_m(state, *sharded._put(batch))

    np.testing.assert_allclose(float(m_m["loss"]), float(m_s["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_m["correct"]), float(m_s["correct"]))
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_s),
                               rtol=1e-5, atol=1e-6)
