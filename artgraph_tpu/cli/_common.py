"""Shared CLI plumbing: the reference's base argparse surface, loss factories,
and the train/valid/test loop skeleton every script instantiates.

The reference duplicates this loop in eight scripts (SURVEY.md §3.1); flag
names, defaults, checkpoint naming, early-stopping parameters, print formats
and MLflow metric names are preserved 1:1 here.
"""
from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from artgraph_tpu import config
from artgraph_tpu.checkpointing import (
    load_reference_checkpoint,
    save_reference_checkpoint,
)
from artgraph_tpu.data import prepare_dataloader
from artgraph_tpu.metrics import summarize, write_results
from artgraph_tpu.tracking import log_metric, track_params
from artgraph_tpu.train import EarlyStopping, cross_entropy
from artgraph_tpu.train.trainer import Trainer, accuracy_metrics

NUM_CLASSES = dict(config.NUM_CLASSES)


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: the 20-40s ResNet/ViT compiles are
    paid once per program shape across ALL CLI invocations, not per process.
    Override the location with JAX_COMPILATION_CACHE_DIR."""
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/artgraph_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags


def _pin_platform() -> None:
    """Honor ARTGRAPH_PLATFORM=cpu|tpu|... for every CLI.

    Some environments force-register a TPU plugin at interpreter start and
    override JAX_PLATFORMS, so the env var alone cannot select a backend;
    the jax.config update below wins regardless. Pinning "cpu" gives users
    a smoke-run path on hosts whose accelerator is absent or unreachable.
    """
    platform = os.environ.get("ARTGRAPH_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


_enable_compilation_cache()
_pin_platform()


def get_base_arguments() -> argparse.ArgumentParser:
    """Shared argparse surface (ref: src/utils.py:17-28) + TPU extras."""
    parser = argparse.ArgumentParser()
    parser.add_argument('--image_path', type=str, default=config.IMAGE_DIR,
                        help='Experiment name.')
    parser.add_argument('--dataset_path', type=str, default=config.DATASET_DIR,
                        help='Experiment name.')
    parser.add_argument('--exp', type=str, default='test', help='Experiment name.')
    parser.add_argument('--epochs', type=int, default=1,
                        help='Number of epochs to train.')
    parser.add_argument('--batch', type=int, default=32,
                        help='Number of epochs to train.')
    parser.add_argument('--lr', type=float, default=3e-4,
                        help='Initial learning rate.')
    parser.add_argument('--with_weights', action='store_true',
                        help='If using class weights for tackling class imabalnces.')
    parser.add_argument('-t', '--tracking', action='store_true',
                        help='If tracking or not with MLFlow.')
    # TPU-native extras (no reference analog)
    parser.add_argument('--num_workers', type=int, default=6,
                        help='Host data-loader worker threads.')
    parser.add_argument('--data_parallel', type=int, default=0,
                        help='Devices on the data mesh axis (0 = single device).')
    parser.add_argument('--results_dir', type=str, default=None,
                        help='If set, emit reference-schema results CSVs here.')
    parser.add_argument('--image_cache', type=str, default=None,
                        help='Directory for the decoded-uint8 image cache '
                             '(first epoch decodes once; later epochs read '
                             'at memory bandwidth).')
    parser.add_argument('--resident_data', action='store_true',
                        help='Keep the decoded dataset resident in device '
                             'HBM and gather batches on device (zero bulk '
                             'H2D per step). Needs the uint8 dataset + '
                             'embeddings to fit in HBM (~150KB/image).')
    parser.add_argument('--no_epoch_scan', action='store_true',
                        help='With --resident_data, keep per-batch step '
                             'dispatch instead of compiling the epoch as '
                             'one lax.scan program (the scan is faster '
                             'per epoch but its first compile can take '
                             'minutes before the XLA cache warms).')
    parser.add_argument('--init_checkpoint', type=str, default=None,
                        help='Warm-start from a .pt checkpoint: a full '
                             'reference checkpoint of this model, or a '
                             'trunk-only file (raw torchvision resnet50 / '
                             'timm ViT state_dict — the pretrained weights '
                             'the reference fine-tunes from). Matching '
                             'subtrees are imported; everything else stays '
                             'freshly initialized.')
    parser.add_argument('--resume', type=str, default=None,
                        help='Checkpoint directory for crash recovery: the '
                             'full train state (params+opt_state+BN stats+'
                             'epoch+early-stop state) is saved there after '
                             'every epoch via Orbax, and training continues '
                             'from it when the directory exists. The '
                             'reference has no resume (save-only best '
                             'checkpoints).')
    return parser


def make_loaders(datasets: Dict, batch_size: int, num_workers: int,
                 seed: int = config.GLOBAL_SEED, cache_dir: str = None,
                 resident: bool = False, mesh=None, epoch_scan: bool = True):
    """Reference loader kwargs (ref: train_baseline.py:23-25).

    `resident=True` keeps each split in HBM (data.resident); if a split
    does not fit the device's free memory the loader WARNS and falls back
    to the host DataLoader for that split. Over a data mesh, residency is
    sharded: each device stores only its own rows (1/num_devices of the
    bytes per chip)."""
    if cache_dir:
        from artgraph_tpu.data.cache import wrap_with_cache
        datasets = {name: wrap_with_cache(ds, cache_dir, name)
                    for name, ds in datasets.items()}
    host_kwargs = dict(batch_size=batch_size, shuffle=True, drop_last=False,
                       num_workers=num_workers, seed=seed)
    if resident:
        import warnings

        from artgraph_tpu.data.loader import DataLoader
        from artgraph_tpu.data.resident import (ResidentCapacityError,
                                                ResidentLoader)
        loaders = {}
        for name, ds in datasets.items():
            try:
                loaders[name] = ResidentLoader(
                    ds, batch_size=batch_size, shuffle=True, drop_last=False,
                    seed=seed, mesh=mesh, epoch_scan=epoch_scan)
            except ResidentCapacityError as e:
                warnings.warn(f"--resident_data: split {name!r} exceeds the "
                              f"HBM budget ({e}); using the host loader")
                loaders[name] = DataLoader(ds, **host_kwargs)
        return loaders
    return prepare_dataloader(datasets, batch_size=batch_size,
                              num_workers=num_workers, shuffle=True,
                              drop_last=False, pin_memory=True, seed=seed)


def make_mesh(args):
    if getattr(args, 'data_parallel', 0):
        import jax

        from artgraph_tpu.parallel import create_mesh
        # --data_parallel N means DP over the FIRST N devices (N may be
        # fewer than the host exposes, e.g. a 4-device mesh on an 8-chip
        # slice); create_mesh itself requires data*model == len(devices).
        n = args.data_parallel
        return create_mesh(data=n, devices=jax.devices()[:n])
    return None


# --------------------------------------------------------------------------
# Loss factories (batch layouts carry the loader's trailing mask)
# --------------------------------------------------------------------------

def single_task_loss(class_weights: Optional[np.ndarray]):
    cw = None if class_weights is None else jnp.asarray(class_weights)

    def compute(outputs, batch):
        labels, mask = batch[-2], batch[-1]
        loss = cross_entropy(outputs, labels, class_weights=cw, mask=mask)
        return loss, accuracy_metrics(outputs, labels, mask)

    return compute


def multi_task_loss(weights_style, weights_genre, w_style: float, w_genre: float):
    """w_style*CE_s + w_genre*CE_g (0.6/0.4 baseline multitask,
    ref: train_baseline_multitask.py:50-51; 0.5/0.5 new-multimodal,
    ref: train_new_multimodal_multitask.py:79-81)."""
    cw_s = None if weights_style is None else jnp.asarray(weights_style)
    cw_g = None if weights_genre is None else jnp.asarray(weights_genre)

    def compute(outputs, batch):
        labels, mask = batch[-2], batch[-1]
        style_labels, genre_labels = labels[:, 0], labels[:, 1]
        loss = (w_style * cross_entropy(outputs[0], style_labels, cw_s, mask)
                + w_genre * cross_entropy(outputs[1], genre_labels, cw_g, mask))
        metrics = accuracy_metrics(outputs[0], style_labels, mask, "style_")
        metrics.update(accuracy_metrics(outputs[1], genre_labels, mask, "genre_"))
        return loss, metrics

    return compute


# --------------------------------------------------------------------------
# Checkpoint helpers (reference .pt format)
# --------------------------------------------------------------------------

def checkpoint_saver(trainer: Trainer, model_name: str):
    def save(state, path):
        os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
        import jax
        save_reference_checkpoint(model_name,
                                  jax.device_get(trainer.variables(state)),
                                  path)
    return save


def reload_state(trainer: Trainer, model_name: str, path: str):
    return trainer.state_from_variables(load_reference_checkpoint(model_name, path))


def _overlay_tree(dest: dict, src: dict, path: str, imported: list,
                  skipped: list) -> dict:
    """Recursive merge: leaves present in both with matching shapes come
    from src (cast to dest dtype); everything else keeps dest (fresh)."""
    out = {}
    for k, d in dest.items():
        p = f"{path}/{k}" if path else str(k)
        if k not in src:
            skipped.append(p)
            out[k] = d
        elif isinstance(d, dict):
            out[k] = _overlay_tree(d, src[k], p, imported, skipped)
        else:
            s = np.asarray(src[k])
            if s.shape == d.shape:
                imported.append(p)
                out[k] = s.astype(np.asarray(d).dtype)
            else:
                skipped.append(f"{p} (shape {s.shape} != {d.shape})")
                out[k] = d
    return out


def apply_init_checkpoint(trainer: Trainer, state, model_name: str,
                          path: str):
    """--init_checkpoint: overlay matching subtrees from a .pt checkpoint
    onto the freshly-initialized state (the reference's pretrained
    fine-tuning, ref: models.py:51-53,97: torchvision/timm weights).

    Tries the full reference layout of `model_name` first, then falls back
    to trunk-only import (raw torchvision/timm or another model sharing
    the trunk). Prints which subtrees were imported vs left fresh.
    """
    import jax
    import torch

    from artgraph_tpu.checkpointing import (import_model_state,
                                            import_trunk_state)

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in raw.items()}
    try:
        variables = import_model_state(model_name, sd)
        scope = "full model"
    except KeyError:
        variables = import_trunk_state(model_name, sd)
        scope = "trunk only"

    imported: list = []
    skipped: list = []
    host = jax.device_get(trainer.variables(state))
    params = _overlay_tree(host["params"], variables.get("params", {}),
                           "params", imported, skipped)
    stats = _overlay_tree(host.get("batch_stats", {}),
                          variables.get("batch_stats", {}),
                          "batch_stats", imported, skipped)

    def tops(paths):
        return sorted({"/".join(p.split("/")[:2]) for p in paths})

    print(f"init_checkpoint {path}: {scope}; imported {len(imported)} "
          f"tensors ({', '.join(tops(imported))}); "
          f"fresh {len(skipped)} ({', '.join(tops(skipped)) or 'none'})")
    return trainer.state_from_variables({"params": params,
                                         "batch_stats": stats})


def maybe_warm_start(args, trainer: Trainer, state, model_name: str):
    if getattr(args, "init_checkpoint", None):
        return apply_init_checkpoint(trainer, state, model_name,
                                     args.init_checkpoint)
    return state


# --------------------------------------------------------------------------
# Test-split evaluation + optional results CSVs
# --------------------------------------------------------------------------

def evaluate_single_task(trainer, state, loader, num_classes: int,
                         results_dir: Optional[str] = None,
                         output_index: Optional[int] = None,
                         suffix: str = "") -> float:
    def pick(out, idx):
        if idx is None:
            return out
        for i in (idx if isinstance(idx, tuple) else (idx,)):
            out = out[i]
        return out

    metrics, collected = trainer.eval_epoch(state, loader, collect_outputs=True)
    logits, labels = [], []
    task_col = {"_style": 0, "_genre": 1}.get(suffix)
    for out_batch, rest in collected:
        logits.append(pick(out_batch, output_index))
        lab = rest[-1]  # labels are the last non-mask batch component
        if lab.ndim == 2:  # multitask [n, 2] -> pick the task's column
            if task_col is None:
                raise ValueError(
                    "multitask labels need suffix '_style' or '_genre' to "
                    "select a column (got suffix=%r)" % (suffix,))
            lab = lab[:, task_col]
        labels.append(lab)
    scores = np.concatenate(logits)
    y_true = np.concatenate(labels)
    summary = summarize(y_true, scores, num_classes)
    if results_dir:
        write_results(results_dir, summary, suffix=suffix)
    return summary["accuracy"]


def save_resume_payload(resume_dir: str, payload: dict, meta: dict) -> None:
    """Orbax state + ATOMIC json sidecar (tmp + rename: a crash mid-write —
    exactly the window --resume exists for — must not leave a truncated
    meta.json that makes every restart fail in json.load). Shared by the
    Trainer-based CLIs and the GNN trainer's custom loop."""
    import json

    from artgraph_tpu.checkpointing import save_checkpoint

    os.makedirs(resume_dir, exist_ok=True)
    save_checkpoint(os.path.join(resume_dir, "state"), payload)
    meta_path = os.path.join(resume_dir, "meta.json")
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)


def save_resume_state(resume_dir: str, trainer: Trainer, state, epoch: int,
                      early_stop: EarlyStopping) -> None:
    """Persist the FULL train state (params+opt_state+BN stats) with Orbax,
    plus a json sidecar for loop/early-stop scalars."""
    import jax

    payload = jax.device_get({
        "step": int(state.step),
        "params": state.params,
        "batch_stats": dict(state.batch_stats),
        "opt_state": state.opt_state,
    })
    save_resume_payload(resume_dir, payload, {
        "epoch": epoch,
        "best_loss": early_stop.best_loss,
        "wait": early_stop.wait,
        "stop": early_stop.stop,
    })


def load_resume_state(resume_dir: str, trainer: Trainer, fresh_state,
                      early_stop: EarlyStopping):
    """Restore (state, next_epoch) saved by save_resume_state; the fresh
    state provides the shape/dtype template Orbax restores into."""
    import json

    import jax

    from artgraph_tpu.checkpointing import restore_checkpoint
    from artgraph_tpu.train.train_state import TrainState

    with open(os.path.join(resume_dir, "meta.json")) as f:
        meta = json.load(f)
    template = jax.device_get({
        "step": int(fresh_state.step),
        "params": fresh_state.params,
        "batch_stats": dict(fresh_state.batch_stats),
        "opt_state": fresh_state.opt_state,
    })
    restored = restore_checkpoint(os.path.join(resume_dir, "state"),
                                  target=template)
    state = TrainState(step=restored["step"], params=restored["params"],
                       batch_stats=restored["batch_stats"],
                       opt_state=restored["opt_state"])
    early_stop.best_loss = meta["best_loss"]
    early_stop.wait = meta["wait"]
    early_stop.stop = meta["stop"]
    print(f"resumed from {resume_dir}: epoch {meta['epoch']}, "
          f"step {restored['step']}")
    return state, int(meta["epoch"])


def run_epoch_loop(args, trainer, state, loaders, early_stop: EarlyStopping,
                   train_fn, valid_fn):
    """The reference epoch loop: always runs all --epochs; early stopping only
    selects the saved checkpoint (ref: train_baseline.py:133-137 note).
    With --resume, the loop checkpoints the full train state after every
    epoch and continues from the saved epoch on restart."""
    if args.tracking:
        track_params(args)
    start_epoch = 0
    resume_dir = getattr(args, "resume", None)
    if resume_dir and os.path.exists(os.path.join(resume_dir, "meta.json")):
        state, start_epoch = load_resume_state(resume_dir, trainer, state,
                                               early_stop)
        # Continue the rng streams where the crashed run left off instead of
        # replaying epoch 0: dropout keys derive from _host_step (one per
        # train batch == state.step), and each loader's shuffle rng derives
        # from its epoch counter — advance both to their pre-crash values so
        # the resumed run sees the same batch order and dropout masks an
        # uninterrupted run would.
        trainer._host_step = int(state.step)
        for ld in (loaders.values() if isinstance(loaders, dict)
                   else loaders):
            if hasattr(ld, "_epoch"):
                ld._epoch += start_epoch
    for epoch in range(start_epoch, args.epochs):
        state = train_fn(state, epoch)
        state = valid_fn(state, epoch)
        if resume_dir:
            save_resume_state(resume_dir, trainer, state, epoch + 1,
                              early_stop)
    return state


def log_test_metric(args, name: str, value: float) -> None:
    if args.tracking:
        log_metric(name, value)
