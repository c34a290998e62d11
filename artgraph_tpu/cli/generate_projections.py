"""Batch inference writer: projected embeddings for valid/test artworks
(pipeline stage 3).

CLI-compatible rebuild of ref src/generate_projections.py: for every file in
PROJECTIONS_DIR, load it as a LabelProjector (always the ResNet variant,
ref :30), run order-preserving (shuffle=False) inference over the validation
and test splits, and save row-aligned [N, 128] tensors to
dataset/{validation,test}/embeddings/<proj_name> in the reference .pt format.
"""
from __future__ import annotations

from os import listdir
from os.path import isfile, join

import jax
import numpy as np

from artgraph_tpu import config
from artgraph_tpu.data import ArtGraphSingleTask, DataLoader, prepare_raw_dataset
from artgraph_tpu.data.embeddings import save_embedding
from artgraph_tpu.checkpointing import load_reference_checkpoint
from artgraph_tpu.models import LabelProjector
from artgraph_tpu.ops.preprocess import normalize_images


def load_dataset(base_dir: str, image_dir: str):
    raw_valid = prepare_raw_dataset(base_dir, type='validation')
    raw_test = prepare_raw_dataset(base_dir, type='test')
    dataset_valid = ArtGraphSingleTask(image_dir, raw_valid[['image', 'style', 'genre']])
    dataset_test = ArtGraphSingleTask(image_dir, raw_test[['image', 'style', 'genre']])
    return dataset_valid, dataset_test


def generate(projections_dir: str = None, dataset_dir: str = None,
             image_dir: str = None, batch_size: int = 32,
             num_workers: int = 6) -> None:
    projections_dir = projections_dir or config.PROJECTIONS_DIR
    dataset_dir = dataset_dir or config.DATASET_DIR
    image_dir = image_dir or config.IMAGE_DIR

    proj_names = [f for f in listdir(projections_dir)
                  if isfile(join(projections_dir, f))]

    dataset_valid, dataset_test = load_dataset(dataset_dir, image_dir)
    model = LabelProjector(emb_size=config.EMB_SIZE)

    @jax.jit
    def infer(variables, images_u8):
        images = normalize_images(images_u8, 'resnet')
        return model.apply(variables, images, train=False)

    for proj_name in proj_names:
        variables = load_reference_checkpoint('LabelProjector',
                                              join(projections_dir, proj_name))

        for split, dataset in (('validation', dataset_valid), ('test', dataset_test)):
            loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                                drop_last=False, num_workers=num_workers)
            out = np.zeros((len(dataset), config.EMB_SIZE), dtype=np.float32)
            print(f'Generating projections for {split} artworks...')
            row = 0
            for images, _, mask in loader:
                n = int(mask.sum())
                emb = np.asarray(jax.device_get(infer(variables, images)))
                out[row:row + n] = emb[:n]
                row += n
            save_embedding(join(dataset_dir, split, 'embeddings', proj_name), out)


def main(argv=None):
    generate()


if __name__ == '__main__':
    main()
