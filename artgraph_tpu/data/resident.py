"""HBM-resident dataset loader: upload once, gather batches on device.

The decoded-uint8 cache (data/cache.py) removes JPEG decode from cached
epochs, but every batch still crosses host->device. On this container the
TPU is reached through a tunnel moving ~19 MB/s, so a 128x224x224x3 uint8
batch costs ~1 s of wire time — 20x the 45 ms compute step. Even on real
PCIe/ICI hardware the transfer is pure overhead when the dataset fits in
HBM (16 GB on v5e; 224px uint8 images are ~150 KB each, so ~100k images
fit alongside ResNet50/ViT-B activations).

ResidentLoader materializes every dataset component ONCE (vectorized
get_batch over all rows — this is also what fills the decoded cache),
ships them to the device a single time, and then serves each batch as a
jitted on-device gather: zero bulk H2D per step, identical batch order,
padding and masks to the host DataLoader (same per-epoch shuffle rng).

Capacity: the upload is guarded by an estimate of the dataset's bytes
against the device's free HBM (`memory_stats()`); when it does not fit,
`ResidentCapacityError` is raised and the CLI layer falls back to the host
DataLoader with a warning (cli/_common.py::make_loaders). For the real
ArtGraph splits at 224px uint8 (~150 KB/image): test 17,471 rows ≈ 2.6 GB
fits; a >100k-row train split ≈ 15+ GB does NOT fit a single 16 GB v5e —
use `mesh=` residency, which stores only each device's own rows
(1/num_devices of the bytes per chip).

Sharded residency (`mesh=`): rows are placed block-cyclically — global row
i of an (unshuffled) epoch belongs to the device that consumes it inside
the shard_map DP step, i.e. device (i % batch_size) // (batch_size / D).
Batches are produced by a jitted shard_map gather: each device reads ONLY
its own resident rows (zero cross-device traffic) and the concatenated
output is a global jax.Array sharded P(axis) over the batch dimension —
exactly what Trainer._build_train_step_shardmap consumes. With
shuffle=False the yielded values are identical to the host DataLoader's;
with shuffle=True each device shuffles its own residency per epoch (same
rng scheme, folded with the device index), which preserves exactly-once
coverage but permutes rows differently from the host loader (documented
deviation — a global shuffle would defeat device-local residency). A
second deviation follows for drop_last=True: the dropped remainder always
comes from each device's OWN tail, so the devices holding the block-cyclic
remainder rows are systematically under-sampled, where the host loader
drops a uniformly random global tail. No CLI uses drop_last with sharded
residency; prefer pad_last (masked) epochs there.

The reference has no analog (its DataLoader re-reads JPEGs every epoch,
ref: src/data/data.py:38-49); this is the TPU-native answer to the same
hot loop.
"""
from __future__ import annotations

import numpy as np


class ResidentCapacityError(RuntimeError):
    """Dataset does not fit the HBM budget; use the host loader instead."""

    def __init__(self, need: int, free: int, budget: int):
        self.need, self.free, self.budget = need, free, budget
        super().__init__(
            f"resident dataset needs ~{need / 1e9:.2f} GB but the HBM "
            f"budget is {budget / 1e9:.2f} GB (free {free / 1e9:.2f} GB); "
            "falling back to the host loader (or shard residency over a "
            "mesh: each device then holds 1/num_devices of the rows)")


def estimate_nbytes(dataset) -> int:
    """Estimated resident footprint: one row's bytes x len(dataset)."""
    row = dataset.get_batch(np.zeros(1, dtype=np.int64))
    return int(sum(np.asarray(c).nbytes for c in row)) * len(dataset)


def _device_budget(device, frac: float):
    """(free_bytes, budget_bytes) from the device's allocator stats, or
    (None, None) when the platform does not report them (CPU tests)."""
    try:
        stats = device.memory_stats()
    except Exception:
        return None, None
    if not stats or "bytes_limit" not in stats:
        return None, None
    free = int(stats["bytes_limit"]) - int(stats.get("bytes_in_use", 0))
    return free, int(frac * free)


class ResidentLoader:
    """Drop-in replacement for data.loader.DataLoader (same iterator
    contract: yields (components..., f32 mask) with static shapes) whose
    batches never leave the device(s).

    Args match DataLoader; `num_workers` is accepted and ignored (there is
    no host work to parallelize after upload). `mesh`/`axis` select
    sharded residency (see module docstring). `budget_frac` bounds the
    upload to that fraction of currently-free device memory;
    `hbm_budget_bytes` overrides the measured budget (tests).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 0, seed: int = 1,
                 pad_last: bool = True, mesh=None, axis: str = "data",
                 budget_frac: float = 0.6, hbm_budget_bytes: int = None,
                 epoch_scan: bool = True):
        import jax
        import jax.numpy as jnp

        if not hasattr(dataset, "get_batch"):
            raise TypeError(
                f"{type(dataset).__name__} has no vectorized get_batch(); "
                "ResidentLoader requires one")
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.pad_last = pad_last
        self.mesh = mesh
        self.axis = axis
        # Consent bit for Trainer's epoch-as-one-program fast path (fewer
        # dispatches, but the scanned epoch is one big XLA program whose
        # FIRST compile can take minutes on slow toolchains — the
        # persistent compilation cache amortizes it across runs).
        self.epoch_scan = epoch_scan
        self.n = len(dataset)
        self._epoch = 0
        self._jnp = jnp

        D = 1 if mesh is None else mesh.shape[axis]
        if mesh is not None and batch_size % D:
            raise ValueError(f"batch_size {batch_size} not divisible by the "
                             f"{axis} axis size {D}")
        if mesh is not None and not pad_last and self.n % batch_size:
            raise ValueError("sharded residency requires pad_last=True when "
                             "the dataset is ragged (static shard shapes)")

        # capacity guard BEFORE materializing the full dataset
        self.nbytes = estimate_nbytes(dataset)
        device = (jax.devices()[0] if mesh is None
                  else mesh.devices.flat[0])
        per_device = self.nbytes // D
        if hbm_budget_bytes is not None:
            free = budget = int(hbm_budget_bytes)
        else:
            free, budget = _device_budget(device, budget_frac)
        if budget is not None and per_device > budget:
            raise ResidentCapacityError(per_device, free, budget)

        comps = dataset.get_batch(np.arange(self.n, dtype=np.int64))
        comps = tuple(np.asarray(c) for c in comps)

        if mesh is None:
            self.data = tuple(jax.device_put(c) for c in comps)

            def gather(data, idx):
                return tuple(a[idx] for a in data)

            self._gather = jax.jit(gather)
            return

        # ---- sharded residency -------------------------------------------
        from jax.sharding import NamedSharding, PartitionSpec as P

        from artgraph_tpu.parallel.mesh import shard_map

        pb = batch_size // D
        # block-cyclic: global row i -> device (i % B) // pb, local slot
        # (i // B) * pb + (i % pb). Device-local valid counts differ by at
        # most pb; pad every device's store to the common length.
        i = np.arange(self.n)
        dev_of = (i % batch_size) // pb
        self._n_local = np.bincount(dev_of, minlength=D)
        n_pad = int(
            (self._n_local.max() + pb - 1) // pb * pb) if self.n else pb
        sharded = NamedSharding(mesh, P(axis))
        # Shards are materialized per device via the callback so the host
        # never holds a second full-dataset copy (the padded [D, n_pad]
        # store) — only one 1/D-sized shard buffer is live at a time, and
        # each component of `comps` is dropped as soon as it is resident.
        # Matters at exactly the scale sharding exists for: a ~15 GB train
        # split would otherwise need ~30 GB of host RAM during __init__.
        comps = list(comps)
        data = []
        for ci, c in enumerate(comps):
            shape = (D, n_pad) + c.shape[1:]

            def make_shard(index, _c=c):
                d = index[0].start or 0
                rows = _c[dev_of == d]
                buf = np.zeros((1, n_pad) + _c.shape[1:], dtype=_c.dtype)
                buf[0, :len(rows)] = rows
                return buf

            data.append(jax.make_array_from_callback(
                shape, sharded, make_shard))
            comps[ci] = None
        self.data = tuple(data)

        def local_gather(data, idx):
            # data leaves [1, n_pad, ...], idx [1, pb] -> [pb, ...]
            return tuple(a[0][idx[0]] for a in data)

        self._gather = jax.jit(shard_map(
            local_gather, mesh=mesh,
            in_specs=(tuple(P(axis) for _ in self.data), P(axis)),
            out_specs=tuple(P(axis) for _ in self.data)))
        self._idx_sharding = sharded
        self._pb, self._D = pb, D

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def _epoch_plan(self):
        """Host-side epoch schedule: ([n_batches, B] padded index matrix,
        per-batch valid counts). One array so the epoch costs ONE index
        upload instead of one per batch (each tiny device_put pays the full
        host->device round-trip latency on tunneled platforms)."""
        order = np.arange(self.n)
        if self.shuffle:
            # identical rng scheme to DataLoader._batch_indices so host and
            # resident loaders produce bit-identical epochs
            rng = np.random.default_rng((self.seed, self._epoch))
            rng.shuffle(order)
        stop = self.n - self.n % self.batch_size if self.drop_last else self.n
        B = self.batch_size
        starts = range(0, stop, B)
        idx_all = np.zeros((len(starts), B), dtype=np.int64)
        valid = []
        for row, start in enumerate(starts):
            idx = order[start:start + B]
            idx_all[row, :len(idx)] = idx  # pad slots gather row 0
            valid.append(len(idx))
        return idx_all, valid

    def _iter_single(self):
        idx_all, valid = self._epoch_plan()
        idx_dev = self._jnp.asarray(idx_all)
        B = self.batch_size
        for row, k in enumerate(valid):
            if not self.pad_last:
                # DataLoader's pad_last=False contract: NO mask on any
                # batch, ragged final batch kept ragged (loader.py _finalize)
                batch = self._gather(self.data, idx_dev[row])
                yield batch if k == B else tuple(c[:k] for c in batch)
                continue
            mask = np.zeros(B, np.float32)
            mask[:k] = 1.0
            yield (*self._gather(self.data, idx_dev[row]), mask)

    def epoch_arrays(self):
        """One epoch's device-side schedule, ONE upload per epoch:
        (index matrix, f32 mask matrix, host-side per-batch valid counts).
        Single device: [n_batches, B] each. Sharded: [n_batches, D, pb]
        each, sharded P(None, axis) so lax.scan slices yield per-device
        index blocks. The Trainer's epoch-scan fast path consumes this
        directly (gathers run inside its scan / shard_map); device_iter
        wraps it as a per-batch stream. Advances the shuffle epoch.
        Requires pad_last=True (the masked-batch contract)."""
        if not self.pad_last:
            # pad_last=False batches are ragged (no mask to exclude the
            # row-0 pad duplicates) — that contract only exists on
            # __iter__; the trainer stream is always masked.
            raise NotImplementedError("epoch_arrays requires pad_last=True")
        self._epoch += 1
        if self.mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            idx_all, mask_all, valid = self._plan_sharded()
            sh = NamedSharding(self.mesh, P(None, self.axis))
            return (jax.device_put(idx_all, sh),
                    jax.device_put(mask_all, sh), valid)
        idx_all, valid = self._epoch_plan()
        B = self.batch_size
        mask_all = (np.arange(B)[None, :]
                    < np.asarray(valid)[:, None]).astype(np.float32)
        return (self._jnp.asarray(idx_all), self._jnp.asarray(mask_all),
                valid)

    def device_iter(self):
        """(n_valid, batch_size, device_batch) epoch stream for
        Trainer._prefetched: every component INCLUDING the mask lives on
        device, uploaded in one transfer per epoch, and the valid counts
        are known host-side — zero per-batch host->device traffic and no
        device->host sync anywhere in the epoch."""
        idx_dev, mask_dev, valid = self.epoch_arrays()
        B = self.batch_size
        for row, k in enumerate(valid):
            batch = self._gather(self.data, idx_dev[row])
            yield float(k), B, (*batch, mask_dev[row])

    def _plan_sharded(self):
        """Host-side sharded epoch schedule: ([nb, D, pb] per-device index
        blocks, [nb, D, pb] f32 masks, per-batch GLOBAL valid counts).
        Only the final batch can be ragged (device-local row counts differ
        by at most pb, so every k < nb-1 block is full on every device)."""
        D, pb = self._D, self._pb
        nb = len(self)
        orders = []
        for d in range(D):
            o = np.arange(self._n_local[d])
            if self.shuffle:
                rng = np.random.default_rng((self.seed, self._epoch, d))
                rng.shuffle(o)
            orders.append(o)
        idx_all = np.zeros((nb, D, pb), dtype=np.int64)
        mask_all = np.zeros((nb, D, pb), dtype=np.float32)
        valid = []
        for k in range(nb):
            tot = 0
            for d in range(D):
                sl = orders[d][k * pb:(k + 1) * pb]
                idx_all[k, d, :len(sl)] = sl
                mask_all[k, d, :len(sl)] = 1.0
                tot += len(sl)
            valid.append(tot)
        return idx_all, mask_all, valid

    def _iter_sharded(self):
        import jax

        B = self.batch_size
        idx_all, mask_all, valid = self._plan_sharded()
        for k in range(len(valid)):
            batch = self._gather(
                self.data, jax.device_put(idx_all[k], self._idx_sharding))
            if not self.pad_last:  # divisible dataset: no-mask contract
                yield batch
            else:
                yield (*batch, mask_all[k].reshape(B))

    def __iter__(self):
        self._epoch += 1
        return (self._iter_single() if self.mesh is None
                else self._iter_sharded())
