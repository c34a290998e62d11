"""New-multimodal multi-task trainer — the reference's BEST model
(new_multimodal_multitask_vit, BASELINE.md headline rows).

CLI-compatible rebuild of ref src/train_new_multimodal_multitask.py: six
embedding-file flags, --architecture vit default, 0.5/0.5 task loss
(ref :79-81), patience 3. The reference's test() always rebuilds the ResNet
variant even when trained as ViT (ref :131 — a latent bug, SURVEY.md §7);
we reload the architecture actually trained.
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
    multi_task_loss,
    NUM_CLASSES,
    reload_state,
    run_epoch_loop,
)
from artgraph_tpu.data import get_class_weights, load_dataset_multitask_new_multimodal
from artgraph_tpu.models import NewMultiModalMultiTask, NewMultiModalMultiTaskViT
from artgraph_tpu.tracking import tracker_multitask
from artgraph_tpu.train import EarlyStopping
from artgraph_tpu.train.trainer import Trainer, adam


def main(argv=None):
    parser = get_base_arguments()
    parser.add_argument('--emb_desc', type=str, default='new multimodal multitask',
                        help='Experiment description.')
    parser.add_argument('--emb_type', type=str, default='genre',
                        help='Embedding type (artwork|genre|style).')
    parser.add_argument('--emb_train_genre', type=str,
                        default='gnn_genre_embs_graph.pt',
                        help='Embedding genre train file name.')
    parser.add_argument('--emb_valid_genre', type=str,
                        default='gnn_genre_valid_embs_graph.pt',
                        help='Embedding genre valid file name.')
    parser.add_argument('--emb_test_genre', type=str,
                        default='gnn_genre_test_embs_graph.pt',
                        help='Embedding genre test file name.')
    parser.add_argument('--emb_train_style', type=str,
                        default='gnn_style_embs_graph.pt',
                        help='Embedding style train file name.')
    parser.add_argument('--emb_valid_style', type=str,
                        default='gnn_style_valid_embs_graph.pt',
                        help='Embedding style valid file name.')
    parser.add_argument('--emb_test_style', type=str,
                        default='gnn_style_test_embs_graph.pt',
                        help='Embedding style test file name.')
    parser.add_argument('--dropout', type=float, default=0.4, help='Dropout.')
    parser.add_argument('--architecture', type=str, default='vit',
                        help='Architecture (resnet|vit).')
    args = parser.parse_args(argv)

    dataset_train, dataset_valid, dataset_test = load_dataset_multitask_new_multimodal(
        base_dir=args.dataset_path, image_dir=args.image_path,
        emb_type=args.emb_type,
        emb_train={'style': args.emb_train_style, 'genre': args.emb_train_genre},
        emb_valid={'style': args.emb_valid_style, 'genre': args.emb_valid_genre},
        emb_test={'style': args.emb_test_style, 'genre': args.emb_test_genre},
        transform_type=args.architecture)
    mesh = make_mesh(args)
    loaders = make_loaders({'train': dataset_train, 'valid': dataset_valid,
                            'test': dataset_test}, args.batch, args.num_workers,
                           cache_dir=args.image_cache,
                           resident=args.resident_data, mesh=mesh,
                           epoch_scan=not args.no_epoch_scan)

    if args.architecture == 'resnet':
        model = NewMultiModalMultiTask(emb_size=config.EMB_SIZE,
                                       num_classes=NUM_CLASSES,
                                       dropout=args.dropout)
        model_name = 'NewMultiModalMultiTask'
    else:
        model = NewMultiModalMultiTaskViT(emb_size=config.EMB_SIZE,
                                          num_classes=NUM_CLASSES,
                                          dropout=args.dropout)
        model_name = 'NewMultiModalMultiTaskViT'

    if args.with_weights:
        cw_s = get_class_weights(dataset_train, NUM_CLASSES['style'], 'style')
        cw_g = get_class_weights(dataset_train, NUM_CLASSES['genre'], 'genre')
    else:
        cw_s = cw_g = None

    trainer = Trainer(
        model=model,
        optimizer=adam(args.lr),
        # batch: (img, emb_style, emb_genre, labels[:,2], mask)
        forward_inputs=lambda img, batch: (img, batch[1], batch[2]),
        compute_loss=multi_task_loss(cw_s, cw_g, 0.5, 0.5),
        transform_type=args.architecture,
        mesh=mesh,
        seed=config.GLOBAL_SEED,
    )
    state = trainer.init(next(iter(loaders['train'])))
    state = maybe_warm_start(args, trainer, state, model_name)

    checkpoint_name = os.path.join(config.CHECKPOINTS_DIR,
                                   'new-multimodal_multi-task_checkpoint.pt')
    early_stop = EarlyStopping(patience=3, min_delta=0.001,
                               checkpoint_path=checkpoint_name,
                               save_fn=checkpoint_saver(trainer, model_name))

    @tracker_multitask(args.tracking, 'train')
    def train(box, epoch):
        box[0], m = trainer.train_epoch(box[0], loaders['train'])
        return m['loss'], m['style_correct'], m['genre_correct'], epoch

    @tracker_multitask(args.tracking, 'valid')
    def valid(box, epoch):
        m = trainer.eval_epoch(box[0], loaders['valid'])
        early_stop(m['loss'], box[0])
        return m['loss'], m['style_correct'], m['genre_correct'], epoch

    def train_step(state, epoch):
        box = [state]
        loss, acc_s, acc_g, _ = train(box, epoch)
        print(f'Train loss: {loss}; train style accuracy: {acc_s}; '
              f'train genre accuracy {acc_g}')
        return box[0]

    def valid_step(state, epoch):
        box = [state]
        loss, acc_s, acc_g, _ = valid(box, epoch)
        print(f'Validation loss: {loss}; validation style accuracy: {acc_s}; '
              f'validation genre accuracy {acc_g}')
        return box[0]

    state = run_epoch_loop(args, trainer, state, loaders, early_stop,
                           train_step, valid_step)

    state = reload_state(trainer, model_name, checkpoint_name)
    style_acc = evaluate_single_task(trainer, state, loaders['test'],
                                     NUM_CLASSES['style'], args.results_dir,
                                     output_index=0, suffix='_style')
    genre_acc = evaluate_single_task(trainer, state, loaders['test'],
                                     NUM_CLASSES['genre'], args.results_dir,
                                     output_index=1, suffix='_genre')
    print(f'Test style accuracy: {style_acc}; test genre accuracy: {genre_acc}')
    log_test_metric(args, 'test style acc', style_acc)
    log_test_metric(args, 'test genre acc', genre_acc)
    return style_acc, genre_acc


if __name__ == '__main__':
    main()
