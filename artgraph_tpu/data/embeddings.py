"""Embedding-tensor IO with reference format preservation.

The reference stores KG node embeddings and projector outputs as torch-saved
tensors (.pt) — ref: train_gnn_embeddings.py:91-92, generate_projections.py:65,84.
We keep that format readable/writable (torch-cpu is only an IO codec here; no
torch compute), and additionally support .npy for a torch-free path.
"""
from __future__ import annotations

import os

import numpy as np


def load_embedding(path: str) -> np.ndarray:
    """Load a 2D float32 embedding matrix from .pt (torch) or .npy."""
    if path.endswith(".npy"):
        arr = np.load(path)
    else:
        import torch  # IO codec only

        tensor = torch.load(path, map_location="cpu", weights_only=False)
        arr = tensor.detach().numpy() if hasattr(tensor, "detach") else np.asarray(tensor)
    return np.ascontiguousarray(arr, dtype=np.float32)


def save_embedding(path: str, array: np.ndarray) -> None:
    """Save an embedding matrix; .pt keeps reference interop (torch tensor)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    array = np.ascontiguousarray(array, dtype=np.float32)
    if path.endswith(".npy"):
        np.save(path, array)
    else:
        import torch

        torch.save(torch.from_numpy(array.copy()), path)
