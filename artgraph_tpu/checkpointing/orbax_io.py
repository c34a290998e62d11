"""Orbax checkpointing for full train states (params + opt_state + step).

This goes beyond the reference, which saves model state_dicts only (optimizer
state is never saved; no resume — ref: src/models/models.py:37-39). Orbax
gives async, sharding-aware, resumable checkpoints — the TPU-native recovery
mechanism (SURVEY.md §5 failure-detection row). Reference-format .pt export
lives in torch_interop.
"""
from __future__ import annotations

import os

import orbax.checkpoint as ocp


def save_checkpoint(path: str, state) -> None:
    """Save a pytree train state to an Orbax checkpoint directory."""
    path = os.path.abspath(path)
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, state, force=True)
    checkpointer.wait_until_finished()


def restore_checkpoint(path: str, target=None):
    """Restore a pytree saved by save_checkpoint.

    `target` (an abstract pytree of like-shaped arrays) restores with correct
    shardings/dtypes; None restores as host numpy.
    """
    path = os.path.abspath(path)
    checkpointer = ocp.StandardCheckpointer()
    if target is None:
        return checkpointer.restore(path)
    return checkpointer.restore(path, target)
