"""The production multi-chip ViT configuration: BOTH fused transformer-block
Pallas kernels (ops.attention.fused_block_attention + ops.mlp.fused_block_mlp)
executing INSIDE shard_map Manual axes at mesh > 1.

Until round 5 this path had zero executions anywhere: the kernels were gated
off on CPU (tests and the MULTICHIP dryrun fell back to XLA attention) and
the real chip only ever ran them under a 1-device mesh. The specific bug
class under test is the interaction of the kernels' in-VMEM param-grad
accumulators (custom_vjp) with the psum-transpose gradient scaling of the
shard_map DP step (CLAUDE.md "GRADIENT GOTCHA"): under check_vma=False the
per-device grads are axis_size-scaled local partials and pmean must
reconstruct the exact global gradient — for custom_vjp param grads exactly
as for standard AD ones.

models.vit.force_pallas_kernels() turns the kernels on off-TPU (Pallas
interpret mode), the same pattern the CSR GNN kernels already use inside
shard_map (ops/csr_segment.py).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artgraph_tpu.models.vit import (ViT, _pallas_attention_on,
                                     force_pallas_kernels,
                                     force_xla_attention)
from artgraph_tpu.parallel.mesh import create_mesh
from artgraph_tpu.train import cross_entropy
from artgraph_tpu.train.trainer import (Trainer, accuracy_metrics,
                                        sgd_momentum)

NUM_CLASS = 5


class TinyViTClassifier(nn.Module):
    """Full ViT trunk (2 fused-kernel blocks per layer) + linear head, at a
    geometry small enough for Pallas interpret mode on the CPU mesh."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ViT(patch_size=8, embed_dim=32, depth=2, num_heads=4,
                   mlp_ratio=2.0, dtype=jnp.float32, name="vit")(
                       x, train=train)
        return nn.Dense(NUM_CLASS, name="head")(feat)


def _batch(b=16, seed=0, ragged=False):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, (b, 16, 16, 3), dtype=np.uint8)
    labels = rng.integers(0, NUM_CLASS, (b,)).astype(np.int32)
    mask = np.ones((b,), np.float32)
    if ragged:
        mask[b // 2:] = 0.0
    return (images, labels, mask)


CLASS_WEIGHTS = jnp.asarray(np.linspace(0.5, 2.0, NUM_CLASS), jnp.float32)


def _loss(outputs, batch):
    labels, mask = batch[1], batch[2]
    loss = cross_entropy(outputs, labels, class_weights=CLASS_WEIGHTS,
                         mask=mask)
    return loss, accuracy_metrics(outputs, labels, mask)


def _make_trainer(mesh):
    # SGD, not Adam, deliberately: (a) the qkv K-bias gradient is
    # mathematically zero (softmax shift invariance) so it is pure float
    # noise, and Adam amplifies any noise DIFFERENCE between grid
    # partitionings to full-lr drift; (b) Adam's zero-init moments make the
    # first updates ~±lr·sign(grad), which would MASK an axis_size gradient
    # scaling error — the exact bug class this suite exists to catch. Under
    # SGD a scale error shows up directly in the params.
    return Trainer(TinyViTClassifier(), sgd_momentum(1e-2),
                   lambda img, b: (img,), _loss, transform_type="vit",
                   mesh=mesh)


def test_force_gate():
    """The CPU gate itself: kernels off by default, on inside the scope, and
    force_xla_attention (the auto-sharded-jit fallback) still wins."""
    assert jax.devices()[0].platform == "cpu"
    assert not _pallas_attention_on(True)
    with force_pallas_kernels():
        assert _pallas_attention_on(True)
        with force_xla_attention():
            assert not _pallas_attention_on(True)
    assert not _pallas_attention_on(True)


def test_forced_trace_contains_pallas_calls():
    """Proof the forced trace really is the kernel path: the jaxpr of a
    value_and_grad step carries pallas_call primitives (fwd + bwd kernels),
    and the unforced trace carries none."""
    batch = _batch(b=2)
    trainer = _make_trainer(None)

    def loss_of(params, variables, images):
        v = dict(variables)
        v["params"] = params
        out = trainer.model.apply(v, images, train=False)
        return cross_entropy(out, jnp.asarray(batch[1][:2]))

    images = jnp.asarray(batch[0], jnp.float32) / 255.0
    with force_pallas_kernels():
        variables = trainer.model.init(jax.random.PRNGKey(0), images)
        jaxpr_fused = str(jax.make_jaxpr(jax.grad(loss_of))(
            variables["params"], variables, images))
    jaxpr_plain = str(jax.make_jaxpr(jax.grad(loss_of))(
        variables["params"], variables, images))
    assert "pallas_call" in jaxpr_fused
    assert "pallas_call" not in jaxpr_plain


@pytest.fixture(scope="module", params=[8, 4])
def mesh(request):
    devices = jax.devices()[:request.param]
    return create_mesh(data=request.param, model=1, devices=devices)


def test_fused_shardmap_train_step_matches_single_device(mesh):
    """3 fused-kernel DP train steps at mesh>1 vs 3 single-device fused
    steps: loss, metrics and every parameter must agree. Both sides trace
    inside force_pallas_kernels() so this compares the KERNEL path under
    shard_map against the KERNEL path single-device — isolating the
    psum/pmean combine math."""
    batch = _batch()
    single = _make_trainer(None)
    sharded = _make_trainer(mesh)

    with force_pallas_kernels():
        s0 = single.init(batch)
        s1 = sharded.init(batch)
        step_s = single._build_train_step(has_bn=False)
        step_m = sharded._build_train_step(has_bn=False)
        rng = jax.random.PRNGKey(7)
        for _ in range(3):
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


def test_fused_shardmap_eval_matches_single_device_ragged(mesh):
    """Fused-kernel eval at mesh>1 on a ragged masked batch (half the shards
    fully masked): psum'd loss numerator/denominator must still give the
    exact global mean with the kernels on."""
    batch = _batch(ragged=True, seed=3)
    single = _make_trainer(None)
    sharded = _make_trainer(mesh)

    with force_pallas_kernels():
        state = single.init(batch)
        ev_s = single._build_eval_step(has_bn=False)
        ev_m = sharded._build_eval_step(has_bn=False)
        out_s, m_s = ev_s(state, *single._put(batch))
        out_m, m_m = ev_m(state, *sharded._put(batch))

    np.testing.assert_allclose(float(m_m["loss"]), float(m_s["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_m["correct"]), float(m_s["correct"]))
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_s),
                               rtol=1e-5, atol=1e-6)


def test_fused_matches_unfused_single_device():
    """Model-level fused-vs-module parity: one train step with the kernels
    forced on vs the plain flax path, identical init. f32 end to end, so the
    only differences are contraction/accumulation order inside the kernels."""
    batch = _batch(seed=5)
    fused = _make_trainer(None)
    plain = _make_trainer(None)

    rng = jax.random.PRNGKey(7)
    with force_pallas_kernels():
        sf = fused.init(batch)
        step_f = fused._build_train_step(has_bn=False)
        sf, mf = step_f(sf, rng, *fused._put(batch))

    sp = plain.init(batch)
    step_p = plain._build_train_step(has_bn=False)
    sp, mp = step_p(sp, rng, *plain._put(batch))

    np.testing.assert_allclose(float(mf["loss"]), float(mp["loss"]),
                               rtol=1e-5)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(sp.params),
            jax.tree_util.tree_leaves_with_path(sf.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(pa))
