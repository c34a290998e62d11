"""Device mesh construction and sharding rules.

This subsystem is NEW CAPABILITY — the reference is strictly single-device
(every script hardcodes 'cuda'; no torch.distributed anywhere, SURVEY.md §2.2)
— and is the throughput vehicle for the v5e-8 target:

  * data parallelism: batches sharded over the 'data' mesh axis, params
    replicated; gradient all-reduce is emitted automatically by XLA when the
    train step is jitted with these shardings (collectives ride ICI);
  * optional 'model' axis: classifier/MLP weight matrices can be sharded on
    their output dimension (simple tensor parallelism) — not needed for
    capability parity (models are ResNet50/ViT-B) but exercised by the
    multi-chip dry-run;
  * multi-host: jax.distributed.initialize + per-process data feeding via
    jax.make_array_from_process_local_data.
"""
from __future__ import annotations

import functools as _functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8: top-level shard_map with check_vma
    from jax import shard_map as _jax_shard_map
    shard_map = _functools.partial(_jax_shard_map, check_vma=False)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _jax_shard_map
    shard_map = _functools.partial(_jax_shard_map, check_rep=False)


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX.

    Safe no-op when no coordinator is given (single host) or when the
    distributed runtime is already up (e.g. launched under a TPU pod
    launcher that auto-initializes). On TPU pods the num_processes /
    process_id arguments are auto-detected; on CPU/GPU they are required.
    Exercised by tests/test_multihost.py on a real 2-process CPU cluster.
    """
    if not coordinator:
        return
    # NOTE: this check must not touch the XLA backend (jax.process_count()
    # would initialize it, after which initialize() refuses to run)
    if jax.distributed.is_initialized():
        return  # a pod launcher already initialized the distributed runtime
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # jax 0.9 wording: "jax.distributed.initialize should only be
        # called once"; older versions said "already initialized"
        msg = str(e).lower()
        if "already" in msg or "only be called once" in msg:
            return
        raise


def create_mesh(data: Optional[int] = None, model: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Defaults to all devices on the data axis (pure DP) — the idiomatic layout
    for ResNet50/ViT-B at 224px where parameters fit per chip with room to
    spare. Device order follows jax.devices(), which JAX arranges so that
    adjacent mesh coordinates are ICI neighbors.
    """
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    if data * model != len(devices):
        raise ValueError(
            f"mesh {data}x{model} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated across the mesh (parameters, scalars)."""
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh, rules=None):
    """Place a parameter pytree on the mesh.

    Default: replicate everything (pure DP). `rules` is an optional callable
    (path_tuple, leaf) -> PartitionSpec for tensor-parallel experiments, e.g.
    sharding ViT MLP kernels over the 'model' axis.
    """
    if rules is None:
        sharding = replicated(mesh)
        return jax.device_put(params, sharding)

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat
    placed = []
    for path, leaf in leaves:
        spec = rules(path, leaf) or P()
        placed.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, placed)


def global_batch_array(local_batch: np.ndarray, mesh: Mesh):
    """Assemble a globally-sharded array from per-process local data
    (multi-host input path; ref has no analog — new capability)."""
    return jax.make_array_from_process_local_data(
        batch_sharding(mesh), local_batch)
