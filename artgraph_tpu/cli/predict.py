"""Batched inference CLI — the serving path the reference never had.

Loads any reference-format .pt checkpoint (ours or the published ones) and
classifies images at TPU batch throughput:

    python -m artgraph_tpu.cli.predict \
        --checkpoint checkpoints/style_resnet_baseline_single-task_checkpoint.pt \
        --model ResnetSingleTask --label style \
        --images path/to/dir_or_files... [--top_k 3] [--output preds.csv]

For the fusion models (NewMultiModal*), pass --emb_style/--emb_genre .pt
files with row-aligned projected embeddings (generate_projections output).
Batches are padded to a static size so one compiled program serves any
request size.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from artgraph_tpu import config
from artgraph_tpu.checkpointing import load_reference_checkpoint
from artgraph_tpu.data.embeddings import load_embedding
from artgraph_tpu.data.transforms import decode_resize_uint8
from artgraph_tpu.ops.preprocess import normalize_images

MODELS = {
    # name -> (constructor, transform_type, needs_embeddings, multi_task)
    "ResnetSingleTask": ("resnet", False, False),
    "ViTSingleTask": ("vit", False, False),
    "ResnetMultiTask": ("resnet", False, True),
    "ViTMultiTask": ("vit", False, True),
    "NewMultiModalSingleTask": ("resnet", True, False),
    "NewMultiModalSingleTaskVit": ("vit", True, False),
    "NewMultiModalMultiTask": ("resnet", True, True),
    "NewMultiModalMultiTaskViT": ("vit", True, True),
}


def build_model(name: str, label: str):
    from artgraph_tpu import models as m

    nc = config.NUM_CLASSES
    single_nc = nc[label] if label else None
    ctors = {
        "ResnetSingleTask": lambda: m.ResnetSingleTask(single_nc),
        "ViTSingleTask": lambda: m.ViTSingleTask(single_nc),
        "ResnetMultiTask": lambda: m.ResnetMultiTask(nc),
        "ViTMultiTask": lambda: m.ViTMultiTask(nc),
        "NewMultiModalSingleTask": lambda: m.NewMultiModalSingleTask(
            config.EMB_SIZE, single_nc),
        "NewMultiModalSingleTaskVit": lambda: m.NewMultiModalSingleTaskVit(
            config.EMB_SIZE, single_nc),
        "NewMultiModalMultiTask": lambda: m.NewMultiModalMultiTask(
            config.EMB_SIZE, nc),
        "NewMultiModalMultiTaskViT": lambda: m.NewMultiModalMultiTaskViT(
            config.EMB_SIZE, nc),
    }
    return ctors[name]()


def gather_images(paths):
    files = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if f.lower().endswith((".jpg", ".jpeg", ".png"))))
        else:
            files.append(p)
    return files


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--model", type=str, required=True,
                        choices=sorted(MODELS))
    parser.add_argument("--label", type=str, default="genre",
                        help="Task for single-task models (style|genre).")
    parser.add_argument("--images", type=str, nargs="+", required=True,
                        help="Image files and/or directories.")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--top_k", type=int, default=3)
    parser.add_argument("--emb_style", type=str, default=None,
                        help="Row-aligned style embeddings (.pt) for fusion models.")
    parser.add_argument("--emb_genre", type=str, default=None,
                        help="Row-aligned genre embeddings (.pt) for fusion models.")
    parser.add_argument("--output", type=str, default=None,
                        help="Write predictions CSV here (default: stdout JSON).")
    args = parser.parse_args(argv)

    transform_type, needs_emb, multi_task = MODELS[args.model]
    model = build_model(args.model, args.label)
    variables = load_reference_checkpoint(args.model, args.checkpoint)

    files = gather_images(args.images)
    if not files:
        print("no images found", file=sys.stderr)
        return 1

    emb_style = emb_genre = None
    if needs_emb:
        if multi_task:
            if not (args.emb_style and args.emb_genre):
                parser.error(f"{args.model} requires --emb_style and --emb_genre")
            emb_style = load_embedding(args.emb_style)
            emb_genre = load_embedding(args.emb_genre)
        else:
            src = args.emb_style if args.label == "style" else args.emb_genre
            if src is None:
                parser.error(f"{args.model} requires --emb_{args.label}")
            emb_style = load_embedding(src)

    @jax.jit
    def infer(variables, images_u8, *embs):
        images = normalize_images(images_u8, transform_type)
        return model.apply(variables, images, *embs, train=False)

    batch = args.batch
    results = []
    for start in range(0, len(files), batch):
        chunk = files[start:start + batch]
        images = np.zeros((batch, config.IMAGE_SIZE, config.IMAGE_SIZE, 3),
                          dtype=np.uint8)
        for i, path in enumerate(chunk):
            images[i] = decode_resize_uint8(path)
        embs = ()
        if needs_emb:
            def rows(table):
                out = np.zeros((batch, table.shape[1]), np.float32)
                out[:len(chunk)] = table[start:start + len(chunk)]
                return out
            embs = ((rows(emb_style), rows(emb_genre)) if multi_task
                    else (rows(emb_style),))
        outputs = infer(variables, images, *embs)
        outs = outputs if multi_task else [outputs]
        tasks = ["style", "genre"] if multi_task else [args.label]
        for i, path in enumerate(chunk):
            row = {"image": path}
            for task, logits in zip(tasks, outs):
                scores = np.asarray(jax.device_get(logits))[i]
                top = np.argsort(-scores)[:args.top_k]
                row[f"{task}_top{args.top_k}"] = top.tolist()
                row[f"{task}_pred"] = int(top[0])
            results.append(row)

    if args.output:
        import pandas as pd

        pd.DataFrame(results).to_csv(args.output, index=False)
        print(f"wrote {len(results)} predictions to {args.output}")
    else:
        for row in results:
            print(json.dumps(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
