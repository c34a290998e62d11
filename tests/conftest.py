"""Test config: force an 8-device virtual CPU platform BEFORE jax loads.

This is the TPU-world analog of multi-node testing without a cluster
(SURVEY.md §4): sharding/collective paths compile and run on 8 virtual CPU
devices via XLA_FLAGS=--xla_force_host_platform_device_count.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize force-registers the axon TPU backend and
# overrides JAX_PLATFORMS; the config update below wins and pins tests to the
# 8-device virtual CPU platform.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd
import pytest

# ---------------------------------------------------------------------------
# Suite tiers (1-core host; see CLAUDE.md "Workflow"):
#   quick — first-signal tier (~7 min measured on this host):  pytest -m quick
#   fast  — default tier (unmarked): everything not quick/slow
#   slow  — the long e2e/parallel suites: pytest -m slow
# `pytest tests/ -q` still runs quick+fast+slow; deselect with -m.
# ---------------------------------------------------------------------------
_QUICK_MODULES = {
    "test_early_stopping", "test_metrics", "test_losses", "test_data",
    "test_graft_entry", "test_runtime_native", "test_artifacts",
    "test_pretrained_manifest",
}
_SLOW_MODULES = {"test_pipeline_e2e", "test_gnn_parallel", "test_notebook",
                 "test_bf16_policy", "test_epoch_parity"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.fspath.purebasename
        if mod in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
        elif mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    """A miniature ArtGraph-shaped dataset tree: images + manifests.

    Layout mirrors the reference raw files (ref: src/utils.py:30-49):
      <root>/dataset/{train,validation,test}/mapping/artwork_entidx2name.csv
      <root>/dataset/<split>/raw/node-label/artwork/node-label-{style,genre}.csv
      <root>/images/*.jpg

    Images are class-structured (tests/_make_synth.py:render_class_image) and
    labels round-robin so e2e trainer tests can assert learning happens.
    """
    from _make_synth import make_image_tree

    root = tmp_path_factory.mktemp("artgraph")
    n_style, n_genre = 4, 3
    counts = make_image_tree(root, n_style=n_style, n_genre=n_genre)
    return {
        "root": str(root),
        "dataset_dir": str(root / "dataset"),
        "image_dir": str(root / "images"),
        "counts": counts,
        "num_style": n_style,
        "num_genre": n_genre,
    }


@pytest.fixture(scope="session")
def synthetic_graph(tmp_path_factory):
    """Miniature ArtGraph KG raw tree: the 4 graph variants the GNN stage
    loads (ref: train_gnn_embeddings.py:110-115), each with node features,
    labels, num-node-dict and the 9 relations (ref: src/data/artgraph.py)."""
    root = tmp_path_factory.mktemp("artgraph_kg")
    rng = np.random.default_rng(7)
    counts = {"artwork": 12, "artist": 3, "gallery": 2, "style": 4,
              "genre": 3, "tag": 5, "media": 2, "field": 2, "movement": 2}
    edge_types = [
        ("artist", "field", "field"), ("artist", "movement", "movement"),
        ("artist", "teacher", "artist"), ("artwork", "media", "media"),
        ("artwork", "about", "tag"), ("artwork", "genre", "genre"),
        ("artwork", "style", "style"), ("artwork", "author", "artist"),
        ("artwork", "locatedin", "gallery"),
    ]
    feat_dim = 8
    for name in ("train", "train_train", "train_validation", "train_test"):
        raw = root / name / "raw"
        (raw / "node-feat" / "artwork").mkdir(parents=True)
        (raw / "node-label" / "artwork").mkdir(parents=True)
        pd.DataFrame(rng.normal(size=(counts["artwork"], feat_dim)).astype(
            np.float32)).to_csv(raw / "node-feat" / "artwork" / "node-feat.csv",
                                header=False, index=False)
        for label, n in (("style", counts["style"]), ("genre", counts["genre"])):
            pd.Series(rng.integers(0, n, counts["artwork"]).astype(np.float32)
                      ).to_csv(raw / "node-label" / "artwork" /
                               f"node-label-{label}.csv", header=False,
                               index=False)
        pd.DataFrame({k: [v] for k, v in counts.items()}).to_csv(
            raw / "num-node-dict.csv", index=False)
        for h, r, t in edge_types:
            d = raw / "relations" / f"{h}___{r}___{t}"
            d.mkdir(parents=True)
            n_edges = 10
            src = rng.integers(0, counts[h], n_edges)
            dst = rng.integers(0, counts[t], n_edges)
            pd.DataFrame({"src": src, "dst": dst}).to_csv(
                d / "edge.csv", header=False, index=False)
    return {"root": str(root), "counts": counts, "feat_dim": feat_dim}
