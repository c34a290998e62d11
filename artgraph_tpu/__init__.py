"""artgraph_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for multi-modal
artwork classification with the full capability surface of the reference
CILAB-ArtGraph/multi-modal-art-classifier codebase.

Layer map (mirrors reference src/ layering, rebuilt TPU-first):
  config        — path constants + typed experiment configs  (ref: src/config.py)
  data          — manifests, datasets, host loader, hetero-KG (ref: src/data/*)
  models        — Flax ResNet50 / ViT-B/16 / fusion heads / hetero GNN
                  (ref: src/models/*)
  ops           — Pallas TPU kernels (fused preprocess, segment ops, attention)
  parallel      — device mesh + NamedSharding rules (new capability; ref has none)
  train         — sharded train/eval steps, losses, early stopping, trainer loops
  metrics       — top-k / balanced acc / P-R-F1 / confusion matrix + results CSVs
  tracking      — MLflow-compatible experiment tracking (ref: src/utils.py:238-266)
  checkpointing — Orbax checkpoints + torch state_dict import/export
  runtime       — native C++ image decode/resize data-loader (ctypes bindings)
  cli           — the nine reference entry points with identical flags
"""

__version__ = "0.1.0"
