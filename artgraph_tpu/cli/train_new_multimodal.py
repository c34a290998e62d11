"""New-multimodal single-task trainer (the proposed model, single head).

CLI-compatible rebuild of ref src/train_new_multimodal.py: trains with TRUE
GNN embeddings, validates/tests with PROJECTED ones (ref: utils.py:120-153).
Early stopping monitors NEGATIVE accuracy (early_stop(-epoch_acc), ref :99) —
preserved.
"""
from __future__ import annotations

import os

from artgraph_tpu import config
from artgraph_tpu.cli._common import (
    checkpoint_saver,
    evaluate_single_task,
    get_base_arguments,
    log_test_metric,
    make_loaders,
    make_mesh,
    maybe_warm_start,
    NUM_CLASSES,
    reload_state,
    run_epoch_loop,
    single_task_loss,
)
from artgraph_tpu.data import get_class_weights, load_dataset_new_multimodal
from artgraph_tpu.models import NewMultiModalSingleTask
from artgraph_tpu.tracking import tracker
from artgraph_tpu.train import EarlyStopping
from artgraph_tpu.train.trainer import Trainer, adam


def main(argv=None):
    parser = get_base_arguments()
    parser.add_argument('--label', type=str, default='genre',
                        help='Label to predict. Options: (style|genre).')
    parser.add_argument('--emb_desc', type=str, default='genre',
                        help='(gnn|metapath2vec).')
    parser.add_argument('--emb_type', type=str, default='genre',
                        help='Embedding type (artwork|genre|style).')
    parser.add_argument('--emb_train', type=str, default='gnn_genre_embs_graph.pt',
                        help='Embedding train file name.')
    parser.add_argument('--emb_valid', type=str,
                        default='gnn_genre_valid_embs_graph.pt',
                        help='Embedding train file name.')
    parser.add_argument('--emb_test', type=str,
                        default='gnn_genre_test_embs_graph.pt',
                        help='Embedding train file name.')
    parser.add_argument('--dropout', type=float, default=0.4, help='Dropout')
    args = parser.parse_args(argv)

    dataset_train, dataset_valid, dataset_test = load_dataset_new_multimodal(
        base_dir=args.dataset_path, image_dir=args.image_path, label=args.label,
        emb_type=args.emb_type, emb_train=args.emb_train,
        emb_valid=args.emb_valid, emb_test=args.emb_test)
    mesh = make_mesh(args)
    loaders = make_loaders({'train': dataset_train, 'valid': dataset_valid,
                            'test': dataset_test}, args.batch, args.num_workers,
                           cache_dir=args.image_cache,
                           resident=args.resident_data, mesh=mesh,
                           epoch_scan=not args.no_epoch_scan)

    num_class = NUM_CLASSES[args.label]
    model = NewMultiModalSingleTask(emb_size=config.EMB_SIZE,
                                    num_class=num_class, dropout=args.dropout)
    model_name = 'NewMultiModalSingleTask'

    class_weights = (get_class_weights(dataset_train, num_class, args.label)
                     if args.with_weights else None)

    trainer = Trainer(
        model=model,
        optimizer=adam(args.lr),
        # batch: (img, embedding, label, mask)
        forward_inputs=lambda img, batch: (img, batch[1]),
        compute_loss=single_task_loss(class_weights),
        transform_type='resnet',
        mesh=mesh,
        seed=config.GLOBAL_SEED,
    )
    state = trainer.init(next(iter(loaders['train'])))
    state = maybe_warm_start(args, trainer, state, model_name)

    checkpoint_name = os.path.join(
        config.CHECKPOINTS_DIR,
        f'{args.label}_new-multimodal_single-task_checkpoint.pt')
    early_stop = EarlyStopping(patience=3, min_delta=0.001,
                               checkpoint_path=checkpoint_name,
                               save_fn=checkpoint_saver(trainer, model_name))

    @tracker(args.tracking, 'train')
    def train(box, epoch):
        box[0], m = trainer.train_epoch(box[0], loaders['train'])
        return m['loss'], m['correct'], epoch

    @tracker(args.tracking, 'valid')
    def valid(box, epoch):
        m = trainer.eval_epoch(box[0], loaders['valid'])
        # reference early-stops on NEGATIVE accuracy here (ref :99)
        early_stop(-m['correct'], box[0])
        return m['loss'], m['correct'], epoch

    def train_step(state, epoch):
        box = [state]
        loss, acc, _ = train(box, epoch)
        print(f'Train loss: {loss}; train accuracy: {acc}')
        return box[0]

    def valid_step(state, epoch):
        box = [state]
        loss, acc, _ = valid(box, epoch)
        print(f'Validation loss: {loss}; validation accuracy: {acc}')
        return box[0]

    state = run_epoch_loop(args, trainer, state, loaders, early_stop,
                           train_step, valid_step)

    state = reload_state(trainer, model_name, checkpoint_name)
    acc = evaluate_single_task(trainer, state, loaders['test'], num_class,
                               results_dir=args.results_dir)
    print(f'Test accuracy: {acc}')
    log_test_metric(args, 'test acc', acc)
    return acc


if __name__ == '__main__':
    main()
