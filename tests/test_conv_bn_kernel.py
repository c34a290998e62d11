"""The fused 1x1-conv + BN-statistics Pallas units (ops.conv_bn) — unit
parity, model-level fused-vs-module parity, and the production multi-chip
configuration: the units executing INSIDE shard_map Manual axes at mesh > 1
with their raw-moment sums psum'd to global BN statistics
(models.resnet.MixedBatchNorm raw_moments path).

Same bar as tests/test_vit_fused_shardmap.py: the bug class is the units'
in-VMEM accumulators (custom_vjp) composing with the psum-transpose gradient
scaling of the shard_map DP step plus — new here — the CROSS-DEVICE BatchNorm
moments, where a missing psum on s1/s2 gives per-shard statistics (train
loss silently wrong) and a missing pmean gives scaled grads.

force_pallas_kernels() (shared with the ViT kernels) turns the units on
off-TPU in interpret mode. f32 end to end so mesh-vs-single differences are
pure summation-order noise.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artgraph_tpu.models.resnet import (Bottleneck, MixedBatchNorm,
                                        _conv_bn_kernels_on)
from artgraph_tpu.models.vit import force_pallas_kernels, force_xla_attention
from artgraph_tpu.ops.conv_bn import conv1x1_bn_stats
from artgraph_tpu.parallel.mesh import create_mesh
from artgraph_tpu.train import cross_entropy
from artgraph_tpu.train.trainer import (Trainer, accuracy_metrics,
                                        sgd_momentum)

NUM_CLASS = 5


class TinyBottleneckClassifier(nn.Module):
    """One real Bottleneck (both fused units: conv1 stats-only + conv3 with
    the bn2-apply+ReLU prologue) + pooled linear head."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(16, (3, 3), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="stem")(
                        x.astype(self.dtype))
        x = Bottleneck(width=8, strides=1, downsample=True,
                       dtype=self.dtype, name="block")(x, train=train)
        feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(NUM_CLASS, name="head")(feat)


def _batch(b=16, seed=0, ragged=False):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, (b, 8, 8, 3), dtype=np.uint8)
    labels = rng.integers(0, NUM_CLASS, (b,)).astype(np.int32)
    mask = np.ones((b,), np.float32)
    if ragged:
        mask[b // 2:] = 0.0
    return (images, labels, mask)


def _loss(outputs, batch):
    labels, mask = batch[1], batch[2]
    return (cross_entropy(outputs, labels, mask=mask),
            accuracy_metrics(outputs, labels, mask))


def _make_trainer(mesh):
    # SGD for the same reason as the ViT suite: Adam's sign-like first
    # updates would mask an axis_size gradient-scaling error.
    return Trainer(TinyBottleneckClassifier(), sgd_momentum(1e-2),
                   lambda img, b: (img,), _loss, transform_type="resnet",
                   mesh=mesh)


def test_gate():
    """Off on CPU by default / on when forced / off on f64 traces and in
    force_xla scopes / train-mode only."""
    assert jax.devices()[0].platform == "cpu"
    assert not _conv_bn_kernels_on(jnp.bfloat16, True)
    with force_pallas_kernels():
        assert _conv_bn_kernels_on(jnp.bfloat16, True)
        assert _conv_bn_kernels_on(jnp.float32, True)
        assert not _conv_bn_kernels_on(jnp.float64, True)
        assert not _conv_bn_kernels_on(jnp.bfloat16, False)
        with force_xla_attention():
            assert not _conv_bn_kernels_on(jnp.bfloat16, True)


def test_unit_matches_composed_reference():
    """conv1x1_bn_stats fwd (bit-exact) + grads vs the composed jnp ops,
    both prologue variants, mixed cotangents on all three outputs."""
    rng = np.random.default_rng(0)
    M, K, N = 64, 32, 16
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    a = jnp.asarray(rng.normal(size=(K,)) * 0.5 + 1.0, jnp.float32)
    b = jnp.asarray(rng.normal(size=(K,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.1, jnp.float32)

    def ref(x, a, b, w, prologue):
        z = jnp.maximum(x * a + b, 0) if prologue else x
        y = jnp.dot(z, w.astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
        yf = y.astype(jnp.float32)
        return y, jnp.sum(yf, 0), jnp.sum(yf * yf, 0)

    for prologue in (False, True):
        out = conv1x1_bn_stats(x, a, b, w, prologue)
        exp = ref(x, a, b, w, prologue)
        for o, e in zip(out, exp):
            np.testing.assert_allclose(np.asarray(o), np.asarray(e),
                                       rtol=1e-6, atol=1e-6)

        def loss_of(f):
            def wrapped(x, a, b, w):
                y, s1, s2 = f(x, a, b, w, prologue)
                return (jnp.sum(y.astype(jnp.float32) * 0.3)
                        + jnp.sum(s1 * 0.7) + jnp.sum(s2 * 0.11))
            return jax.grad(wrapped, argnums=(0, 1, 2, 3))

        gk = loss_of(conv1x1_bn_stats)(x, a, b, w)
        gr = loss_of(ref)(x, a, b, w)
        for k, r in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(k), np.asarray(r),
                                       rtol=1e-4, atol=1e-5)


def test_fused_matches_unfused_single_device():
    """One train step, kernels forced on vs the plain module path, identical
    init: loss, params and the BN running stats must agree (the raw-moments
    path of MixedBatchNorm against its self-computed path)."""
    batch = _batch(seed=5)
    fused = _make_trainer(None)
    plain = _make_trainer(None)

    rng = jax.random.PRNGKey(7)
    with force_pallas_kernels():
        sf = fused.init(batch)
        step_f = fused._build_train_step(has_bn=True)
        sf, mf = step_f(sf, rng, *fused._put(batch))

    sp = plain.init(batch)
    step_p = plain._build_train_step(has_bn=True)
    sp, mp = step_p(sp, rng, *plain._put(batch))

    np.testing.assert_allclose(float(mf["loss"]), float(mp["loss"]),
                               rtol=1e-5)
    for tree_f, tree_p, what in ((sf.params, sp.params, "params"),
                                 (sf.batch_stats, sp.batch_stats,
                                  "batch_stats")):
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(tree_p),
                jax.tree_util.tree_leaves_with_path(tree_f)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
                err_msg=f"{what}{jax.tree_util.keystr(pa)}")


def test_forced_trace_contains_pallas_calls():
    batch = _batch(b=4)
    trainer = _make_trainer(None)

    def loss_fn(params, stats, images):
        out, _ = trainer.model.apply(
            {"params": params, "batch_stats": stats}, images, train=True,
            mutable=["batch_stats"])
        return cross_entropy(out, jnp.asarray(batch[1][:4]))

    images = jnp.asarray(batch[0], jnp.float32) / 255.0
    with force_pallas_kernels():
        variables = trainer.model.init(jax.random.PRNGKey(0), images)
        jaxpr_fused = str(jax.make_jaxpr(jax.grad(loss_fn))(
            variables["params"], variables["batch_stats"], images))
    jaxpr_plain = str(jax.make_jaxpr(jax.grad(loss_fn))(
        variables["params"], variables["batch_stats"], images))
    assert "pallas_call" in jaxpr_fused
    assert "pallas_call" not in jaxpr_plain


@pytest.fixture(scope="module", params=[8, 4])
def mesh(request):
    devices = jax.devices()[:request.param]
    return create_mesh(data=request.param, model=1, devices=devices)


def test_fused_shardmap_train_step_matches_single_device(mesh):
    """3 fused-unit DP train steps at mesh>1 vs single device: loss, metrics,
    params AND BN running stats must agree — the units' per-shard moment
    sums must psum to the same global statistics the single-device kernel
    computes, and their custom_vjp grads must pmean exactly."""
    batch = _batch()
    single = _make_trainer(None)
    sharded = _make_trainer(mesh)

    with force_pallas_kernels():
        s0 = single.init(batch)
        s1 = sharded.init(batch)
        step_s = single._build_train_step(has_bn=True)
        step_m = sharded._build_train_step(has_bn=True)
        rng = jax.random.PRNGKey(7)
        for _ in range(3):
            s0, m0 = step_s(s0, rng, *single._put(batch))
            s1, m1 = step_m(s1, rng, *sharded._put(batch))

    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["correct"]), float(m0["correct"]))
    for tree_s, tree_m, what in ((s0.params, s1.params, "params"),
                                 (s0.batch_stats, s1.batch_stats,
                                  "batch_stats")):
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(tree_s),
                jax.tree_util.tree_leaves_with_path(tree_m)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6,
                err_msg=f"{what}{jax.tree_util.keystr(pa)}")
