"""Path configuration and experiment constants.

Reproduces the reference's two-tier config (ref: src/config.py:1-7 path
constants + scattered per-script literals, e.g. num_classes duplicated in six
scripts at train_baseline.py:27-30) as one typed module. Paths may be
overridden by environment variables so tests and CLIs can relocate the tree.
"""
from __future__ import annotations

import dataclasses
import os

# --- Path constants (ref: src/config.py:1-7). Same defaults, env-overridable.
IMAGE_DIR = os.environ.get("ARTGRAPH_IMAGE_DIR", "../../images/imagesf2")
DATASET_DIR = os.environ.get("ARTGRAPH_DATASET_DIR", "../dataset")
EMBEDDINGS_DIR = os.environ.get(
    "ARTGRAPH_EMBEDDINGS_DIR", os.path.join(DATASET_DIR, "train", "embeddings")
)
PROJECTIONS_DIR = os.environ.get("ARTGRAPH_PROJECTIONS_DIR", "../proj")
CHECKPOINTS_DIR = os.environ.get("ARTGRAPH_CHECKPOINTS_DIR", "../checkpoints")
RESULTS_DIR = os.environ.get("ARTGRAPH_RESULTS_DIR", "../results")
NOTEBOOKS_DIR = os.environ.get("ARTGRAPH_NOTEBOOKS_DIR", "../notebooks")

# --- Task constants (ref: train_baseline.py:27-30 et al., duplicated there).
NUM_CLASSES = {"genre": 18, "style": 32}

# Embedding width produced by the GNN stage and consumed by every fusion model
# (ref: train_gnn_embeddings.py:131 hidden_channels=128).
EMB_SIZE = 128

# Image geometry (ref: src/data/data.py:14 Resize((224,224))).
IMAGE_SIZE = 224

# Per-architecture normalization statistics
# (ref: src/data/data.py:11-27 transform / vit_transform).
NORM_STATS = {
    "resnet": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "vit": ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
}

# Global seed used by every reference trainer (ref: train_baseline.py:10
# torch.manual_seed(1)).
GLOBAL_SEED = 1

# Projector split seed (ref: src/utils.py:215-221 random_state=11).
PROJECTION_SPLIT_SEED = 11


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Typed bundle of the shared CLI hyperparameters.

    Field names match the reference's shared argparse surface
    (ref: src/utils.py:17-28) so CLI shims map 1:1.
    """

    image_path: str = IMAGE_DIR
    dataset_path: str = DATASET_DIR
    exp: str = "test"
    epochs: int = 1
    batch: int = 32
    lr: float = 3e-4
    with_weights: bool = False
    tracking: bool = False

    # TPU-native additions (no reference analog; defaults keep single-config
    # behavior identical to the reference).
    seed: int = GLOBAL_SEED
    bf16: bool = True            # bf16 compute policy (TPU AMP analog of
                                 # torch.cuda.amp.autocast, ref: train_baseline.py:61)
    data_axis: str = "data"      # mesh axis name for data parallelism
    num_workers: int = 6         # host loader worker threads (ref: train_baseline.py:24)
    prefetch: int = 2            # device prefetch depth
