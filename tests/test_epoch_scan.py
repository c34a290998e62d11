"""Resident epoch-as-one-XLA-program must match the per-batch path.

Trainer._train_epoch_resident runs the whole epoch (on-device gathers +
train steps) inside one jitted lax.scan. The host DataLoader drives the
per-batch reference path with the SAME shuffle rng scheme, so the two
must produce numerically identical training: same rng stream (fold_in of
the same host step counter), same unmasked step on full batches, masked
BN tail outside the scan.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artgraph_tpu.data.loader import DataLoader
from artgraph_tpu.data.resident import ResidentLoader
from artgraph_tpu.models.resnet import MixedBatchNorm
from artgraph_tpu.train import cross_entropy
from artgraph_tpu.train.trainer import Trainer, accuracy_metrics, adam


class TinyBNModel(nn.Module):
    num_class: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3), use_bias=False, dtype=jnp.float32)(x)
        x = MixedBatchNorm(apply_dtype=jnp.float32, name="bn")(x, train=train)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_class)(x)


class TinyDenseModel(nn.Module):
    """No batch_stats: the ragged tail runs INSIDE the epoch scan."""

    num_class: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(16)(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_class)(x)
        return x


class _FakeDS:
    def __init__(self, n):
        self.n = n
        rng = np.random.default_rng(0)
        self.imgs = rng.integers(0, 256, (n, 8, 8, 3), dtype=np.uint8)
        self.labels = (np.arange(n) % 5).astype(np.int32)

    def __len__(self):
        return self.n

    def get_batch(self, idx):
        idx = np.asarray(idx)
        return self.imgs[idx], self.labels[idx]


def _fwd(images, batch):
    return (images,)


def _loss(outputs, batch):
    labels, mask = batch[1], batch[2]
    return (cross_entropy(outputs, labels, mask=mask),
            accuracy_metrics(outputs, labels, mask))


def _trees_close(a, b, **kw):
    for (pa, x), (_, y) in zip(jax.tree_util.tree_leaves_with_path(a),
                               jax.tree_util.tree_leaves_with_path(b)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   err_msg=jax.tree_util.keystr(pa), **kw)


@pytest.mark.parametrize("model_cls,n", [(TinyBNModel, 37),
                                         (TinyDenseModel, 37),
                                         (TinyBNModel, 32)])
def test_epoch_scan_matches_per_batch_path(model_cls, n):
    ds = _FakeDS(n)
    host = DataLoader(ds, batch_size=8, shuffle=True, seed=3, num_workers=1)
    res = ResidentLoader(ds, batch_size=8, shuffle=True, seed=3)

    t_host = Trainer(model_cls(), adam(1e-2), _fwd, _loss, seed=1)
    t_res = Trainer(model_cls(), adam(1e-2), _fwd, _loss, seed=1)

    batch0 = next(iter(DataLoader(ds, batch_size=8, num_workers=1)))
    s_host = t_host.init(batch0)
    s_res = t_res.init(batch0)

    for epoch in range(2):
        s_host, m_host = t_host.train_epoch(s_host, host)
        s_res, m_res = t_res.train_epoch(s_res, res)
        assert m_res["examples"] == m_host["examples"] == n
        np.testing.assert_allclose(m_res["loss"], m_host["loss"], rtol=1e-5)
        np.testing.assert_allclose(m_res["correct"], m_host["correct"])

    assert t_res._host_step == t_host._host_step
    _trees_close(s_host.params, s_res.params, rtol=1e-5, atol=1e-6)
    _trees_close(s_host.batch_stats, s_res.batch_stats,
                 rtol=1e-5, atol=1e-6)

    # eval scan: totals identical to the per-batch eval path
    e_host = t_host.eval_epoch(s_host, host)
    e_res = t_res.eval_epoch(s_res, res)
    np.testing.assert_allclose(e_res["loss"], e_host["loss"], rtol=1e-5)
    np.testing.assert_allclose(e_res["correct"], e_host["correct"])
    assert e_res["examples"] == n

    # collect_outputs also runs as one scanned program: outputs, labels and
    # totals must match the host loader's per-batch collection exactly
    out_h, col_h = t_host.eval_epoch(s_host, host, collect_outputs=True)
    out_r, col_r = t_res.eval_epoch(s_res, res, collect_outputs=True)
    assert t_res._eval_epoch_scan_collect is not None
    np.testing.assert_allclose(out_r["loss"], out_h["loss"], rtol=1e-5)
    assert len(col_r) == len(col_h) == len(res)
    for (o_r, rest_r), (o_h, rest_h) in zip(col_r, col_h):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5,
                                                    atol=1e-6), o_r, o_h)
        for a, b in zip(rest_r, rest_h):
            np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("n", [40, 37])
def test_sharded_epoch_scan_matches_single_device(n):
    """Epoch-as-one-SPMD-program: sharded residency + shard_map DP step
    inside one lax.scan must train identically to the single-device
    per-batch host-loader path (shuffle=False: row order identical)."""
    from artgraph_tpu.parallel.mesh import create_mesh

    ds = _FakeDS(n)
    mesh = create_mesh(data=4, model=2)
    host = DataLoader(ds, batch_size=8, shuffle=False, num_workers=1)
    res = ResidentLoader(ds, batch_size=8, shuffle=False, mesh=mesh)

    t_single = Trainer(TinyBNModel(), adam(1e-2), _fwd, _loss, seed=1)
    t_mesh = Trainer(TinyBNModel(), adam(1e-2), _fwd, _loss, seed=1,
                     mesh=mesh)

    batch0 = next(iter(DataLoader(ds, batch_size=8, num_workers=1)))
    s_single = t_single.init(batch0)
    s_mesh = t_mesh.init(batch0)

    for _ in range(2):
        s_single, m_s = t_single.train_epoch(s_single, host)
        s_mesh, m_m = t_mesh.train_epoch(s_mesh, res)
        np.testing.assert_allclose(m_m["loss"], m_s["loss"], rtol=1e-5)
        np.testing.assert_allclose(m_m["correct"], m_s["correct"])
        assert m_m["examples"] == n

    _trees_close(s_single.params, s_mesh.params, rtol=1e-5, atol=1e-6)
    _trees_close(s_single.batch_stats, s_mesh.batch_stats,
                 rtol=1e-5, atol=1e-6)

    e_s = t_single.eval_epoch(s_single, host)
    e_m = t_mesh.eval_epoch(s_mesh, res)
    np.testing.assert_allclose(e_m["loss"], e_s["loss"], rtol=1e-5)
    np.testing.assert_allclose(e_m["correct"], e_s["correct"])


def test_sharded_epoch_scan_matches_per_batch_sharded_shuffled():
    """shuffle=True: the sharded scan and the per-batch sharded stream
    share one host-side plan (_plan_sharded), so they train identically."""
    from artgraph_tpu.parallel.mesh import create_mesh

    ds = _FakeDS(37)
    mesh = create_mesh(data=4, model=2)
    res_a = ResidentLoader(ds, batch_size=8, shuffle=True, seed=4, mesh=mesh)
    res_b = ResidentLoader(ds, batch_size=8, shuffle=True, seed=4, mesh=mesh)

    t_scan = Trainer(TinyBNModel(), adam(1e-2), _fwd, _loss, seed=1,
                     mesh=mesh)
    t_batch = Trainer(TinyBNModel(), adam(1e-2), _fwd, _loss, seed=1,
                      mesh=mesh)
    t_batch._use_epoch_scan = lambda loader: False

    batch0 = next(iter(DataLoader(ds, batch_size=8, num_workers=1)))
    s_scan = t_scan.init(batch0)
    s_batch = t_batch.init(batch0)

    for _ in range(2):
        s_scan, m_a = t_scan.train_epoch(s_scan, res_a)
        s_batch, m_b = t_batch.train_epoch(s_batch, res_b)
        np.testing.assert_allclose(m_a["loss"], m_b["loss"], rtol=1e-5)
        np.testing.assert_allclose(m_a["correct"], m_b["correct"])

    assert t_scan._host_step == t_batch._host_step
    _trees_close(s_batch.params, s_scan.params, rtol=1e-5, atol=1e-6)
    _trees_close(s_batch.batch_stats, s_scan.batch_stats,
                 rtol=1e-5, atol=1e-6)


def test_epoch_scan_opt_out():
    """epoch_scan=False (CLI --no_epoch_scan) keeps per-batch dispatch."""
    ds = _FakeDS(16)
    res = ResidentLoader(ds, batch_size=8, epoch_scan=False)
    tr = Trainer(TinyDenseModel(), adam(1e-2), _fwd, _loss)
    assert not tr._use_epoch_scan(res)
    state = tr.init(next(iter(DataLoader(ds, batch_size=8, num_workers=1))))
    state, m = tr.train_epoch(state, res)
    assert tr._train_epoch_scan is None and tr._train_step is not None
    assert m["examples"] == 16


def test_epoch_scan_rng_stream_continues_across_paths():
    """host_step advances identically whether an epoch ran as a scan or
    per-batch — a resumed/mixed run keeps one dropout rng stream."""
    ds = _FakeDS(16)
    res = ResidentLoader(ds, batch_size=8)
    host = DataLoader(ds, batch_size=8, num_workers=1)
    tr = Trainer(TinyDenseModel(), adam(1e-2), _fwd, _loss)
    state = tr.init(next(iter(DataLoader(ds, batch_size=8, num_workers=1))))
    state, _ = tr.train_epoch(state, res)
    assert tr._host_step == 2
    state, _ = tr.train_epoch(state, host)
    assert tr._host_step == 4
