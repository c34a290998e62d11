"""Sharded HBM residency + capacity guard (VERDICT round-2 #4).

Each device of a data mesh stores only the rows IT consumes inside the
shard_map DP step (block-cyclic placement), so the per-chip footprint is
1/num_devices of the dataset and batch assembly is a device-local gather
with zero cross-device traffic. The upload is guarded by an
estimated-bytes vs free-HBM check with automatic host-loader fallback."""
import warnings

import numpy as np
import pytest

import jax

from artgraph_tpu.data.loader import DataLoader
from artgraph_tpu.data.resident import (ResidentCapacityError,
                                        ResidentLoader, estimate_nbytes)
from artgraph_tpu.parallel import create_mesh


class _FakeDS:
    """Vectorized dataset: images encode their own row index (traceable)."""

    def __init__(self, n):
        self.n = n
        self.imgs = (np.arange(n)[:, None, None, None]
                     * np.ones((1, 4, 4, 3))).astype(np.float32)
        self.labels = (np.arange(n) % 7).astype(np.int32)

    def __len__(self):
        return self.n

    def get_batch(self, idx):
        idx = np.asarray(idx)
        return self.imgs[idx], self.labels[idx]


@pytest.mark.parametrize("n,batch", [(37, 8), (32, 8)])
def test_sharded_residency_matches_host_loader_unshuffled(n, batch):
    """shuffle=False: the sharded resident loader's batches (valid rows)
    and masks are identical to the host DataLoader's."""
    ds = _FakeDS(n)
    mesh = create_mesh(data=4, model=2)
    host = DataLoader(ds, batch_size=batch, shuffle=False, num_workers=1)
    res = ResidentLoader(ds, batch_size=batch, shuffle=False, mesh=mesh)
    assert len(host) == len(res)
    for hb, rb in zip(host, res):
        assert len(hb) == len(rb)
        hmask, rmask = np.asarray(hb[-1]), np.asarray(rb[-1])
        np.testing.assert_array_equal(hmask, rmask)
        for h, r in zip(hb[:-1], rb[:-1]):
            h, r = np.asarray(h), np.asarray(r)
            # compare under the mask (pad slots gather arbitrary rows)
            np.testing.assert_array_equal(h[hmask > 0], r[rmask > 0])


def test_sharded_residency_batches_are_mesh_sharded():
    ds = _FakeDS(32)
    mesh = create_mesh(data=8, model=1)
    res = ResidentLoader(ds, batch_size=16, shuffle=False, mesh=mesh)
    batch = next(iter(res))
    imgs = batch[0]
    assert isinstance(imgs, jax.Array)
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert imgs.sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), imgs.ndim)
    # each device's shard holds exactly the rows that device owns
    shard = imgs.addressable_shards[0]
    assert shard.data.shape[0] == 16 // 8


def test_sharded_residency_shuffled_exact_coverage():
    """shuffle=True: per-device shuffles still cover every row exactly once
    per epoch, with correct masks."""
    ds = _FakeDS(37)
    mesh = create_mesh(data=4, model=2)
    res = ResidentLoader(ds, batch_size=8, shuffle=True, seed=5, mesh=mesh)
    for _ in range(2):  # two epochs: shuffle rng advances
        seen, total = [], 0.0
        for batch in res:
            imgs, labels, mask = (np.asarray(b) for b in batch)
            total += mask.sum()
            seen.extend(imgs[mask > 0, 0, 0, 0].astype(int).tolist())
        assert total == 37
        assert sorted(seen) == list(range(37))


def test_capacity_guard_raises_and_estimates():
    ds = _FakeDS(64)
    assert estimate_nbytes(ds) == 64 * (4 * 4 * 3 * 4 + 4)
    with pytest.raises(ResidentCapacityError):
        ResidentLoader(ds, batch_size=8, hbm_budget_bytes=100)
    # fits: budget above the estimate
    ResidentLoader(ds, batch_size=8, hbm_budget_bytes=10**9)


def test_make_loaders_falls_back_to_host_loader(monkeypatch):
    """CLI path: an over-budget split warns and uses the host DataLoader."""
    from artgraph_tpu.cli._common import make_loaders
    from artgraph_tpu.data import resident as resident_mod

    ds = _FakeDS(64)
    monkeypatch.setattr(resident_mod, "_device_budget",
                        lambda device, frac: (100, 60))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        loaders = make_loaders({"train": ds}, batch_size=8, num_workers=1,
                               resident=True)
    assert isinstance(loaders["train"], DataLoader)
    assert any("HBM budget" in str(x.message) for x in w)


def test_sharded_residency_requires_divisible_batch():
    ds = _FakeDS(32)
    mesh = create_mesh(data=8, model=1)
    with pytest.raises(ValueError):
        ResidentLoader(ds, batch_size=12, mesh=mesh)
