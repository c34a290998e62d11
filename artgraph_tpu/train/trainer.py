"""Generic sharded trainer for every image-model experiment family.

The reference repeats one train/valid/test closure pattern across eight
scripts (SURVEY.md §3.1); here it is a single Trainer parameterized by two
small functions:

  forward_inputs(images_f32, batch) -> tuple of model args
  compute_loss(outputs, batch)      -> (scalar loss, metrics dict)

TPU-first structure of each step:
  * batches arrive as uint8 NHWC + f32 validity mask (static shapes, no
    recompiles on the ragged final batch);
  * normalization fuses into the jitted step (ops.preprocess);
  * the whole step (fwd + bwd + Adam/SGD update + BN stat update) is ONE
    XLA program with donated state (no host round-trips inside an epoch);
  * under a Mesh, batches are sharded over the 'data' axis and params
    replicated — XLA emits the gradient all-reduce over ICI automatically
    (the reference has no distributed mode at all, SURVEY.md §2.2).

Epoch metric accumulation matches the reference exactly: totals weighted by
the true per-batch example counts (ref: train_baseline.py:68-70).
"""
from __future__ import annotations

import contextlib
from typing import Callable, Dict, Optional, Tuple

_NULL_CTX = contextlib.nullcontext()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jax.sharding import PartitionSpec as P

from artgraph_tpu.data.loader import pipeline
from artgraph_tpu.models.resnet import bn_batch_mask, bn_psum_axis
from artgraph_tpu.models.vit import force_xla_attention
from artgraph_tpu.ops.preprocess import normalize_images
from artgraph_tpu.parallel.mesh import (batch_sharding, replicated,
                                        shard_map as _shard_map)
from artgraph_tpu.train.losses import loss_psum_axis, psum_if_sharded
from artgraph_tpu.train.train_state import TrainState


def _epoch_totals(ms, mask_all):
    """Reference metric accumulation over a scanned epoch: per-batch loss
    weighted by its valid count (loss.item() * n summed, ref:
    train_baseline.py:68-70); other metrics (correct counts) are sums."""
    ns = jnp.sum(mask_all, axis=tuple(range(1, mask_all.ndim)))
    return {k: jnp.sum(v * ns) if k == "loss" else jnp.sum(v, 0)
            for k, v in ms.items()}


def accuracy_metrics(logits, labels, mask, prefix="") -> Dict[str, jnp.ndarray]:
    """Masked correct-prediction count (the reference's accuracy numerator).
    Global over the mesh axis inside a loss_psum_axis scope (shard_map DP)."""
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum((pred == labels).astype(jnp.float32) * mask)
    return {f"{prefix}correct": psum_if_sharded(correct)}


class Trainer:
    def __init__(
        self,
        model,
        optimizer: optax.GradientTransformation,
        forward_inputs: Callable,
        compute_loss: Callable,
        transform_type: str = "resnet",
        eval_forward_inputs: Optional[Callable] = None,
        eval_compute_loss: Optional[Callable] = None,
        mesh=None,
        seed: int = 1,
    ):
        self.model = model
        self.tx = optimizer
        self.forward_inputs = forward_inputs
        self.compute_loss = compute_loss
        self.eval_forward_inputs = eval_forward_inputs or forward_inputs
        self.eval_compute_loss = eval_compute_loss or compute_loss
        self.transform_type = transform_type
        self.mesh = mesh
        self.base_rng = jax.random.PRNGKey(seed)
        self._train_step = None
        self._train_step_masked = None  # ragged-final-batch variant
        self._eval_step = None
        self._train_epoch_scan = None   # resident epoch-as-one-program
        self._eval_epoch_scan = None
        self._eval_epoch_scan_collect = None
        self._host_step = 0  # host-side twin of state.step: keeps rng
                             # derivation off the device (no sync per step)

    # ------------------------------------------------------------------
    def init(self, sample_batch) -> TrainState:
        """Initialize params/opt_state from one (host) batch."""
        images = normalize_images(jnp.asarray(sample_batch[0][:1]),
                                  self.transform_type)
        inputs = self.forward_inputs(images, _slice_batch(sample_batch, 1))
        variables = self.model.init(self.base_rng, *inputs, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        state = TrainState(step=0, params=params, batch_stats=batch_stats,
                           opt_state=self.tx.init(params))
        if self.mesh is not None:
            state = jax.device_put(state, replicated(self.mesh))
        return state

    def state_from_variables(self, variables: dict) -> TrainState:
        """Build a fresh state around imported variables (checkpoint load)."""
        params = variables["params"]
        state = TrainState(step=0, params=params,
                           batch_stats=variables.get("batch_stats", {}),
                           opt_state=self.tx.init(params))
        if self.mesh is not None:
            state = jax.device_put(state, replicated(self.mesh))
        return state

    def variables(self, state: TrainState) -> dict:
        v = {"params": state.params}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        return v

    # ------------------------------------------------------------------
    def _attention_ctx(self):
        """Over a multi-device mesh (auto-sharded jit), the Pallas attention
        kernels cannot be partitioned — jax requires Manual/shard_map axes —
        so XLA would replicate their operands (every device running the full
        global batch). Trace those steps with the partitionable XLA
        attention instead (models.vit.force_xla_attention)."""
        if self.mesh is not None and self.mesh.size > 1:
            return force_xla_attention()
        return contextlib.nullcontext()

    def _build_train_step(self, has_bn: bool, masked: bool = False):
        # Full batches over a mesh run per-device inside shard_map (Manual
        # axes): the Pallas kernels stay on, per-shard losses/metrics/BN
        # moments psum to the exact global values, and gradients psum once.
        # The ragged-final-batch masked variant (at most one batch per
        # epoch) keeps the auto-sharded-jit path below, where
        # _attention_ctx falls back to XLA's partitionable attention.
        if self.mesh is not None and not masked:
            return self._build_train_step_shardmap(has_bn)

        def step_fn(state: TrainState, rng, *batch):
            return self._train_step_math(state, rng, batch, has_bn, masked)

        return jax.jit(step_fn, donate_argnums=(0,))

    def _train_step_math(self, state: TrainState, rng, batch,
                         has_bn: bool, masked: bool):
        """One fwd+bwd+update: the traced body shared by the per-batch
        jitted step and the resident epoch scan (one compilation each)."""
        model = self.model
        images = normalize_images(batch[0], self.transform_type)
        inputs = self.forward_inputs(images, batch)

        def loss_fn(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
                outputs, mut = model.apply(
                    variables, *inputs, train=True,
                    rngs={"dropout": rng}, mutable=["batch_stats"])
                new_stats = mut["batch_stats"]
            else:
                outputs = model.apply(variables, *inputs, train=True,
                                      rngs={"dropout": rng})
                new_stats = state.batch_stats
            loss, metrics = self.compute_loss(outputs, batch)
            return loss, (metrics, new_stats)

        # The ragged final batch's BN statistics must ignore the padded
        # rows (the reference trains on a smaller unpadded batch). Full
        # batches use the unmasked variant — zero overhead on the hot
        # path; this masked step compiles lazily, at most once.
        ctx = (bn_batch_mask(batch[-1]) if (masked and has_bn)
               else _NULL_CTX)
        with ctx, self._attention_ctx():
            (loss, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        return self._apply_update(state, grads, new_stats, metrics, loss)

    def _build_train_step_shardmap(self, has_bn: bool):
        """DP train step as an explicit shard_map over the 'data' axis.

        Equivalent numerics to the auto-sharded-jit step (pinned by
        tests/test_shardmap_trainer.py): losses divide psum'd weighted sums
        (exact under class weights and ragged masks), BN statistics are
        global via bn_psum_axis, gradients psum across shards. Dropout rng
        folds in the device index so masks decorrelate across shards.
        """
        mesh = self.mesh

        def sharded_body(state: TrainState, rng, *batch):
            return self._shard_step_math(state, rng, batch, has_bn)

        def step_fn(state: TrainState, rng, *batch):
            fn = _shard_map(
                sharded_body, mesh=mesh,
                in_specs=(P(), P()) + tuple(P("data") for _ in batch),
                out_specs=P())
            loss, metrics, new_stats, grads = fn(state, rng, *batch)
            return self._apply_update(state, grads, new_stats, metrics,
                                      loss)

        return jax.jit(step_fn, donate_argnums=(0,))

    def _shard_step_math(self, state: TrainState, rng, batch, has_bn: bool):
        """Shard-local fwd+bwd (inside shard_map Manual axes): per-shard
        losses/metrics/BN moments psum to exact global values; returns the
        pmean'd global gradient. Shared by the per-batch shardmap step and
        the sharded epoch scan."""
        model = self.model
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        images = normalize_images(batch[0], self.transform_type)
        inputs = self.forward_inputs(images, batch)

        def loss_fn(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
                outputs, mut = model.apply(
                    variables, *inputs, train=True,
                    rngs={"dropout": rng}, mutable=["batch_stats"])
                new_stats = mut["batch_stats"]
            else:
                outputs = model.apply(variables, *inputs, train=True,
                                      rngs={"dropout": rng})
                new_stats = state.batch_stats
            loss, metrics = self.compute_loss(outputs, batch)
            return loss, (metrics, new_stats)

        bn_ctx = bn_psum_axis("data") if has_bn else _NULL_CTX
        with loss_psum_axis("data"), bn_ctx:
            (loss, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        # The loss is GLOBAL (psum'd numerator/denominator). Under
        # shard_map's check_vma=False AD convention the transpose of
        # psum is psum, so each device's grad is an axis_size-scaled
        # local partial: pmean reconstructs the exact global gradient
        # (psum of partials == axis_size * true grad; the division is a
        # power of two, so this is bit-exact vs single-device — pinned
        # by tests/test_shardmap_trainer.py at two mesh sizes).
        grads = jax.lax.pmean(grads, "data")
        return loss, metrics, new_stats, grads

    def _apply_update(self, state: TrainState, grads, new_stats, metrics,
                      loss):
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               batch_stats=new_stats, opt_state=opt_state)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return new_state, metrics

    def _build_eval_step_shardmap(self, has_bn: bool):
        mesh = self.mesh

        def sharded_body(state: TrainState, *batch):
            return self._shard_eval_math(state, batch, has_bn)

        def step_fn(state: TrainState, *batch):
            fn = _shard_map(
                sharded_body, mesh=mesh,
                in_specs=(P(),) + tuple(P("data") for _ in batch),
                out_specs=(P("data"), P()))
            return fn(state, *batch)

        return jax.jit(step_fn)

    def _shard_eval_math(self, state: TrainState, batch, has_bn: bool):
        images = normalize_images(batch[0], self.transform_type)
        inputs = self.eval_forward_inputs(images, batch)
        variables = {"params": state.params}
        if has_bn:
            variables["batch_stats"] = state.batch_stats
        outputs = self.model.apply(variables, *inputs, train=False)
        with loss_psum_axis("data"):
            loss, metrics = self.eval_compute_loss(outputs, batch)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return outputs, metrics

    def _build_eval_step(self, has_bn: bool):
        if self.mesh is not None:
            return self._build_eval_step_shardmap(has_bn)

        def step_fn(state: TrainState, *batch):
            return self._eval_step_math(state, batch, has_bn)

        return jax.jit(step_fn)

    def _eval_step_math(self, state: TrainState, batch, has_bn: bool):
        images = normalize_images(batch[0], self.transform_type)
        inputs = self.eval_forward_inputs(images, batch)
        variables = {"params": state.params}
        if has_bn:
            variables["batch_stats"] = state.batch_stats
        with self._attention_ctx():
            outputs = self.model.apply(variables, *inputs, train=False)
        loss, metrics = self.eval_compute_loss(outputs, batch)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return outputs, metrics

    # ------------------------------------------------------------------
    # Resident epoch-as-one-XLA-program
    #
    # With the dataset HBM-resident, an epoch needs no host at all: the
    # index/mask schedule uploads once and a lax.scan gathers each batch
    # from the resident store and runs the full train step inside ONE
    # jitted, donated program. Per-batch dispatch (gather + rng fold +
    # step — ~12 ms/batch of pure host/tunnel overhead on this container)
    # disappears; the epoch runs at pure-step throughput. Numerics are the
    # per-batch path's exactly: same rng stream (fold_in of the same host
    # step counter, traced), same unmasked step on full batches, and the
    # ragged tail (BN models only) keeps its masked single-step dispatch.
    # Over a mesh the scan body is the shard_map DP step with the gather
    # INSIDE it (each device reads only its resident rows), so the whole
    # epoch is one SPMD program.
    def _build_train_epoch_scan(self, has_bn: bool):
        if self.mesh is not None:
            return self._build_train_epoch_scan_shardmap(has_bn)

        def epoch_fn(state: TrainState, data, idx_all, mask_all, steps):
            def body(state, xs):
                idx, mask, i = xs
                rng = jax.random.fold_in(self.base_rng, i)
                batch = tuple(a[idx] for a in data) + (mask,)
                return self._train_step_math(state, rng, batch, has_bn,
                                             masked=False)

            state, ms = jax.lax.scan(body, state, (idx_all, mask_all, steps))
            return state, _epoch_totals(ms, mask_all)

        return jax.jit(epoch_fn, donate_argnums=(0,))

    def _build_train_epoch_scan_shardmap(self, has_bn: bool):
        mesh = self.mesh

        def gather_body(state: TrainState, rng, data, idx, mask):
            # local leaves [1, n_pad, ...]; idx/mask [1, pb]
            batch = tuple(a[0][idx[0]] for a in data) + (mask[0],)
            return self._shard_step_math(state, rng, batch, has_bn)

        def epoch_fn(state: TrainState, data, idx_all, mask_all, steps):
            fn = _shard_map(
                gather_body, mesh=mesh,
                in_specs=(P(), P(), tuple(P("data") for _ in data),
                          P("data"), P("data")),
                out_specs=P())

            def body(state, xs):
                idx, mask, i = xs
                rng = jax.random.fold_in(self.base_rng, i)
                loss, metrics, new_stats, grads = fn(state, rng, data,
                                                     idx, mask)
                return self._apply_update(state, grads, new_stats,
                                          metrics, loss)

            state, ms = jax.lax.scan(body, state, (idx_all, mask_all, steps))
            return state, _epoch_totals(ms, mask_all)

        return jax.jit(epoch_fn, donate_argnums=(0,))

    def _build_eval_epoch_scan(self, has_bn: bool):
        if self.mesh is not None:
            return self._build_eval_epoch_scan_shardmap(has_bn)

        def epoch_fn(state: TrainState, data, idx_all, mask_all):
            def body(carry, xs):
                idx, mask = xs
                batch = tuple(a[idx] for a in data) + (mask,)
                _, metrics = self._eval_step_math(state, batch, has_bn)
                return carry, metrics

            _, ms = jax.lax.scan(body, 0, (idx_all, mask_all))
            return _epoch_totals(ms, mask_all)

        return jax.jit(epoch_fn)

    def _build_eval_epoch_scan_shardmap(self, has_bn: bool):
        mesh = self.mesh

        def gather_body(state: TrainState, data, idx, mask):
            batch = tuple(a[0][idx[0]] for a in data) + (mask[0],)
            _, metrics = self._shard_eval_math(state, batch, has_bn)
            return metrics

        def epoch_fn(state: TrainState, data, idx_all, mask_all):
            fn = _shard_map(
                gather_body, mesh=mesh,
                in_specs=(P(), tuple(P("data") for _ in data),
                          P("data"), P("data")),
                out_specs=P())

            def body(carry, xs):
                idx, mask = xs
                return carry, fn(state, data, idx, mask)

            _, ms = jax.lax.scan(body, 0, (idx_all, mask_all))
            return _epoch_totals(ms, mask_all)

        return jax.jit(epoch_fn)

    def _build_eval_epoch_scan_collect(self, has_bn: bool):
        """Output-collecting eval epoch as ONE program (single device): the
        scan additionally stacks the model outputs and the non-image batch
        components ([nb, B, ...]) so the test-split evaluation / predict
        pass needs no per-batch dispatch either. Images are NOT stacked —
        only outputs and the small label/embedding components ride out."""

        def epoch_fn(state: TrainState, data, idx_all, mask_all):
            def body(carry, xs):
                idx, mask = xs
                batch = tuple(a[idx] for a in data) + (mask,)
                outputs, metrics = self._eval_step_math(state, batch, has_bn)
                return carry, (metrics, outputs, batch[1:-1])

            _, (ms, outputs, rest) = jax.lax.scan(
                body, 0, (idx_all, mask_all))
            return _epoch_totals(ms, mask_all), outputs, rest

        return jax.jit(epoch_fn)

    def _eval_epoch_resident_collect(self, state: TrainState, loader):
        has_bn = bool(state.batch_stats)
        idx_all, mask_all, valid = loader.epoch_arrays()
        if self._eval_epoch_scan_collect is None:
            self._eval_epoch_scan_collect = (
                self._build_eval_epoch_scan_collect(has_bn))
        totals, outputs, rest = jax.device_get(
            self._eval_epoch_scan_collect(state, loader.data, idx_all,
                                          mask_all))
        collected = []
        for b, n in enumerate(valid):
            n = int(n)
            collected.append((
                jax.tree_util.tree_map(lambda a: np.asarray(a[b])[:n],
                                       outputs),
                tuple(np.asarray(a[b])[:n] for a in rest)))
        total_examples = float(sum(valid))
        out = {k: float(v) / total_examples for k, v in totals.items()}
        out["examples"] = total_examples
        return out, collected

    def _use_epoch_scan(self, loader) -> bool:
        if not (hasattr(loader, "epoch_arrays")
                and getattr(loader, "pad_last", False)
                and getattr(loader, "epoch_scan", True)):
            return False
        if getattr(loader, "mesh", "missing") is not self.mesh:
            return False  # loader/trainer placement must agree
        return self.mesh is None or getattr(loader, "axis", None) == "data"

    def _train_epoch_resident(self, state: TrainState, loader):
        has_bn = bool(state.batch_stats)
        idx_all, mask_all, valid = loader.epoch_arrays()
        B = loader.batch_size
        nb = len(valid)
        # Without BN the unmasked step handles the ragged tail too (losses
        # and metrics are mask-weighted); BN models need the masked-stats
        # variant, outside the scan.
        ragged_tail = has_bn and nb > 0 and valid[-1] < B
        nb_full = nb - 1 if ragged_tail else nb
        totals: Dict[str, jnp.ndarray] = {}
        total_examples = float(sum(valid))
        if nb_full:
            if self._train_epoch_scan is None:
                self._train_epoch_scan = self._build_train_epoch_scan(has_bn)
            steps = jnp.asarray(self._host_step + np.arange(nb_full),
                                dtype=jnp.int32)
            state, totals = self._train_epoch_scan(
                state, loader.data, idx_all[:nb_full], mask_all[:nb_full],
                steps)
            self._host_step += nb_full
            totals = dict(totals)
        if ragged_tail:
            rng = jax.random.fold_in(self.base_rng, self._host_step)
            self._host_step += 1
            if self._train_step_masked is None:
                self._train_step_masked = self._build_train_step(
                    has_bn, masked=True)
            # sharded: _gather returns global [B]-leading arrays and the
            # [D, pb] mask flattens to the global [B] mask (the masked
            # variant is the auto-sharded-jit step either way)
            batch = (*loader._gather(loader.data, idx_all[nb_full]),
                     mask_all[nb_full].reshape(-1))
            state, metrics = self._train_step_masked(state, rng, *batch)
            n = float(valid[-1])
            totals["loss"] = totals.get("loss", 0.0) + metrics["loss"] * n
            for k, v in metrics.items():
                if k != "loss":
                    totals[k] = totals.get(k, 0.0) + v
        totals = jax.device_get(totals)
        out = {k: float(v) / total_examples for k, v in totals.items()}
        out["examples"] = total_examples
        if not np.isfinite(out["loss"]):
            raise FloatingPointError(
                f"non-finite training loss {out['loss']} at step "
                f"{self._host_step}; check lr/dtype policy")
        return state, out

    def _eval_epoch_resident(self, state: TrainState, loader):
        has_bn = bool(state.batch_stats)
        idx_all, mask_all, valid = loader.epoch_arrays()
        if self._eval_epoch_scan is None:
            self._eval_epoch_scan = self._build_eval_epoch_scan(has_bn)
        totals = jax.device_get(
            self._eval_epoch_scan(state, loader.data, idx_all, mask_all))
        total_examples = float(sum(valid))
        out = {k: float(v) / total_examples for k, v in totals.items()}
        out["examples"] = total_examples
        return out

    # ------------------------------------------------------------------
    def _put(self, batch):
        if self.mesh is None:
            return tuple(jnp.asarray(b) for b in batch)
        sharding = batch_sharding(self.mesh)
        return tuple(jax.device_put(b, sharding) for b in batch)

    def _prefetched(self, loader, size: int = 2):
        """Background-thread batch assembly + H2D, overlapped with compute.

        Yields (n_valid, batch_size, device_batch): the mask statistics are
        computed on the HOST copy in the producer so the consumer never
        forces a device->host sync per step.
        """
        if (self.mesh is None and hasattr(loader, "device_iter")
                and getattr(loader, "pad_last", False)):
            # ResidentLoader fast path: batches (incl. masks) are already on
            # device — one index/mask upload per EPOCH, valid counts known
            # host-side, so the epoch runs with zero per-batch H2D and no
            # sync (each small device_put costs a full round-trip on
            # tunneled platforms; this closed most of the resident-epoch
            # vs pure-step throughput gap).
            return pipeline(loader.device_iter(), size=size)

        def gen():
            for batch in loader:
                mask = batch[-1]
                yield (float(mask.sum()), int(mask.shape[0]),
                       self._put(batch))
        return pipeline(gen(), size=size)

    def train_epoch(self, state: TrainState, loader,
                    epoch: int = 0) -> Tuple[TrainState, Dict[str, float]]:
        if self._use_epoch_scan(loader):
            return self._train_epoch_resident(state, loader)
        has_bn = bool(state.batch_stats)
        if self._train_step is None:
            self._train_step = self._build_train_step(has_bn)

        # Metrics accumulate ON DEVICE across the epoch; a single host read at
        # the end avoids a device->host sync per step (which on tunneled
        # platforms costs ~10-30ms each and serializes dispatch).
        totals: Dict[str, jnp.ndarray] = {}
        total_examples = 0.0
        for n, bsize, batch in self._prefetched(loader):
            rng = jax.random.fold_in(self.base_rng, self._host_step)
            self._host_step += 1
            if has_bn and n < bsize:
                # ragged final batch: masked BN statistics (see
                # _build_train_step); decided host-side so full batches
                # never pay for the mask multiply
                if self._train_step_masked is None:
                    self._train_step_masked = self._build_train_step(
                        has_bn, masked=True)
                step = self._train_step_masked
            else:
                step = self._train_step
            state, metrics = step(state, rng, *batch)
            # reference accumulation: loss.item() * batch_size summed
            totals["loss"] = totals.get("loss", 0.0) + metrics["loss"] * n
            for k, v in metrics.items():
                if k != "loss":
                    totals[k] = totals.get(k, 0.0) + v
            total_examples += n

        totals = jax.device_get(totals)
        out = {k: float(v) / total_examples for k, v in totals.items()}
        out["examples"] = total_examples
        if not np.isfinite(out["loss"]):
            # failure detection (SURVEY.md §5): surface divergence at the
            # epoch boundary instead of silently training on NaNs
            raise FloatingPointError(
                f"non-finite training loss {out['loss']} at step "
                f"{self._host_step}; check lr/dtype policy")
        return state, out

    def eval_epoch(self, state: TrainState, loader,
                   collect_outputs: bool = False):
        if self._use_epoch_scan(loader):
            if not collect_outputs:
                return self._eval_epoch_resident(state, loader)
            if self.mesh is None:  # sharded collect keeps the batch stream
                return self._eval_epoch_resident_collect(state, loader)
        has_bn = bool(state.batch_stats)
        if self._eval_step is None:
            self._eval_step = self._build_eval_step(has_bn)

        totals: Dict[str, jnp.ndarray] = {}
        total_examples = 0.0
        collected = []
        for n, bsize, batch in self._prefetched(loader):
            outputs, metrics = self._eval_step(state, *batch)
            totals["loss"] = totals.get("loss", 0.0) + metrics["loss"] * n
            for k, v in metrics.items():
                if k != "loss":
                    totals[k] = totals.get(k, 0.0) + v
            total_examples += n
            if collect_outputs:
                valid = int(n)
                trim = lambda o: np.asarray(jax.device_get(o))[:valid]
                collected.append((jax.tree_util.tree_map(trim, outputs),
                                  tuple(np.asarray(b)[:valid] for b in batch[1:-1])))

        totals = jax.device_get(totals)
        out = {k: float(v) / total_examples for k, v in totals.items()}
        out["examples"] = total_examples
        if collect_outputs:
            return out, collected
        return out


def _slice_batch(batch, n: int):
    return tuple(np.asarray(b)[:n] for b in batch)


# --------------------------------------------------------------------------
# Optimizers with torch-default hyperparameters
# --------------------------------------------------------------------------

def adam(lr: float) -> optax.GradientTransformation:
    """torch.optim.Adam defaults (betas 0.9/0.999, eps 1e-8) — every
    reference trainer except ContextNet (ref: train_baseline.py:44)."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def sgd_momentum(lr: float, momentum: float = 0.9) -> optax.GradientTransformation:
    """torch.optim.SGD(momentum=0.9) — ContextNet
    (ref: train_baseline_context.py:49)."""
    return optax.sgd(lr, momentum=momentum)
