"""Visual -> KG-embedding projector trainer (pipeline stage 2).

CLI-compatible rebuild of ref src/train_projector.py: SmoothL1 + Adam on the
seeded 80/10/10 split of the train set (random_state=11, ref: utils.py:215-221),
patience 1, checkpoint to PROJECTIONS_DIR/{exp}_checkpoint_projector.pt.
No tracking decorators in the reference — train prints loss only.
"""
from __future__ import annotations

import os

from artgraph_tpu import config
from artgraph_tpu.cli._common import (
    checkpoint_saver,
    get_base_arguments,
    make_loaders,
    make_mesh,
    maybe_warm_start,
    reload_state,
)
from artgraph_tpu.data import load_dataset_projection
from artgraph_tpu.models import LabelProjector, LabelProjectorVit
from artgraph_tpu.train import EarlyStopping, smooth_l1
from artgraph_tpu.train.trainer import Trainer, adam


def main(argv=None):
    parser = get_base_arguments()
    parser.add_argument('--node_embedding', type=str,
                        default='gnn_artwork_genre_embs_graph.pt',
                        help='Node embedding file name.')
    parser.add_argument('--emb_type', type=str, default='artwork',
                        help='The embedding node type (artwork|style|genre).')
    parser.add_argument('--architecture', type=str, default='resnet',
                        help='Architecture (vt|resnet).')
    args = parser.parse_args(argv)

    dataset_train, dataset_valid, dataset_test = load_dataset_projection(
        base_dir=args.dataset_path, image_dir=args.image_path,
        node_embedding=args.node_embedding, emb_type=args.emb_type)
    mesh = make_mesh(args)
    loaders = make_loaders({'train': dataset_train, 'valid': dataset_valid,
                            'test': dataset_test}, args.batch, args.num_workers,
                           cache_dir=args.image_cache,
                           resident=args.resident_data, mesh=mesh,
                           epoch_scan=not args.no_epoch_scan)

    if args.architecture == 'resnet':
        model = LabelProjector(emb_size=config.EMB_SIZE)
        model_name = 'LabelProjector'
    else:
        model = LabelProjectorVit(emb_size=config.EMB_SIZE)
        model_name = 'LabelProjectorVit'

    def compute_loss(outputs, batch):
        # batch: (img, embedding, mask)
        _, embeddings, mask = batch
        return smooth_l1(outputs, embeddings, mask=mask), {}

    trainer = Trainer(
        model=model,
        optimizer=adam(args.lr),
        forward_inputs=lambda img, batch: (img,),
        compute_loss=compute_loss,
        transform_type='resnet',
        mesh=mesh,
        seed=config.GLOBAL_SEED,
    )
    state = trainer.init(next(iter(loaders['train'])))
    state = maybe_warm_start(args, trainer, state, model_name)

    checkpoint_name = f'{args.exp}_checkpoint_projector.pt'
    checkpoint_path = os.path.join(config.PROJECTIONS_DIR, checkpoint_name)
    early_stop = EarlyStopping(patience=1, min_delta=0.001,
                               checkpoint_path=checkpoint_path,
                               save_fn=checkpoint_saver(trainer, model_name))

    for epoch in range(args.epochs):
        state, m = trainer.train_epoch(state, loaders['train'])
        print(f'Train loss: {m["loss"]}')
        m = trainer.eval_epoch(state, loaders['valid'])
        early_stop(m['loss'], state)
        print(f'Validation loss: {m["loss"]}')

    state = reload_state(trainer, model_name, checkpoint_path)
    m = trainer.eval_epoch(state, loaders['test'])
    print(f'Test loss: {m["loss"]}')
    return m['loss']


if __name__ == '__main__':
    main()
