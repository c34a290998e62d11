"""Standalone synthetic ArtGraph-shaped dataset generator for manual drives.

Usage: python tests/_make_synth.py /tmp/drive/artgraph

Produces the same layout as the conftest fixtures (ref: src/utils.py:30-49
for the image manifests; src/data/artgraph.py for the KG raw tree):
  <root>/dataset/{train,validation,test}/mapping/artwork_entidx2name.csv
  <root>/dataset/<split>/raw/node-label/artwork/node-label-{style,genre}.csv
  <root>/images/*.jpg
  <root>/kg/{train,train_train,train_validation,train_test}/raw/...
"""
import pathlib
import sys

import numpy as np
import pandas as pd
from PIL import Image


def render_class_image(style, genre, n_style, n_genre, size, rng):
    """Class-structured pixels so trainers can LEARN on the fixture (the e2e
    tests assert decreasing train loss, which random noise cannot support):
    the red channel encodes style, green stripes encode genre, plus mild
    noise. The signal survives JPEG compression and the 224x224 resize."""
    h, w = size
    arr = np.empty((h, w, 3), np.float32)
    arr[..., 0] = 255.0 * style / max(n_style - 1, 1)
    period = 4 * (genre + 1)
    arr[..., 1] = ((np.arange(h)[:, None] // period) % 2) * 255.0
    arr[..., 2] = 128.0
    arr += rng.normal(0.0, 12.0, arr.shape)
    return np.clip(arr, 0, 255).astype(np.uint8)


def make_image_tree(root: pathlib.Path, counts=None, n_style=4, n_genre=3,
                    size=(48, 64)):
    counts = counts or {"train": 24, "validation": 8, "test": 8}
    image_dir = root / "images"
    image_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for split, n in counts.items():
        split_dir = root / "dataset" / split
        (split_dir / "mapping").mkdir(parents=True, exist_ok=True)
        (split_dir / "raw" / "node-label" / "artwork").mkdir(
            parents=True, exist_ok=True)
        names, styles, genres = [], [], []
        for i in range(n):
            name = f"{split}_{i}.jpg"
            # round-robin labels: every class present in every split
            style, genre = i % n_style, i % n_genre
            arr = render_class_image(style, genre, n_style, n_genre, size, rng)
            Image.fromarray(arr).save(image_dir / name)
            names.append(name)
            styles.append(style)
            genres.append(genre)
        pd.DataFrame({"idx": range(n), "image": names}).to_csv(
            split_dir / "mapping" / "artwork_entidx2name.csv",
            header=False, index=False)
        pd.Series(styles).to_csv(
            split_dir / "raw" / "node-label" / "artwork" /
            "node-label-style.csv", header=False, index=False)
        pd.Series(genres).to_csv(
            split_dir / "raw" / "node-label" / "artwork" /
            "node-label-genre.csv", header=False, index=False)
    return counts


def make_kg_tree(root: pathlib.Path, n_artwork=12, feat_dim=8):
    rng = np.random.default_rng(7)
    counts = {"artwork": n_artwork, "artist": 3, "gallery": 2, "style": 4,
              "genre": 3, "tag": 5, "media": 2, "field": 2, "movement": 2}
    edge_types = [
        ("artist", "field", "field"), ("artist", "movement", "movement"),
        ("artist", "teacher", "artist"), ("artwork", "media", "media"),
        ("artwork", "about", "tag"), ("artwork", "genre", "genre"),
        ("artwork", "style", "style"), ("artwork", "author", "artist"),
        ("artwork", "locatedin", "gallery"),
    ]
    for name in ("train", "train_train", "train_validation", "train_test"):
        raw = root / "kg" / name / "raw"
        (raw / "node-feat" / "artwork").mkdir(parents=True, exist_ok=True)
        (raw / "node-label" / "artwork").mkdir(parents=True, exist_ok=True)
        pd.DataFrame(rng.normal(size=(counts["artwork"], feat_dim)).astype(
            np.float32)).to_csv(
                raw / "node-feat" / "artwork" / "node-feat.csv",
                header=False, index=False)
        for label, n in (("style", counts["style"]),
                         ("genre", counts["genre"])):
            pd.Series(rng.integers(0, n, counts["artwork"]).astype(np.float32)
                      ).to_csv(raw / "node-label" / "artwork" /
                               f"node-label-{label}.csv", header=False,
                               index=False)
        pd.DataFrame({k: [v] for k, v in counts.items()}).to_csv(
            raw / "num-node-dict.csv", index=False)
        for h, r, t in edge_types:
            d = raw / "relations" / f"{h}___{r}___{t}"
            d.mkdir(parents=True, exist_ok=True)
            src = rng.integers(0, counts[h], 10)
            dst = rng.integers(0, counts[t], 10)
            pd.DataFrame({"src": src, "dst": dst}).to_csv(
                d / "edge.csv", header=False, index=False)
    return counts


if __name__ == "__main__":
    root = pathlib.Path(sys.argv[1] if len(sys.argv) > 1
                        else "/tmp/drive/artgraph")
    counts = make_image_tree(root)
    kg = make_kg_tree(root)
    print(f"synthetic dataset at {root}: images={counts}, kg nodes={kg}")
