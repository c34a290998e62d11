"""Image-only multi-task baseline (style+genre heads, 0.6/0.4 loss).

CLI-compatible rebuild of ref src/train_baseline_multitask.py: same flags,
checkpoint name (including the reference's literal 'single-task' in the
multitask checkpoint name), patience 3, loss weights w_style=0.6/w_genre=0.4
(ref :50-51).
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
from artgraph_tpu.data import get_class_weights, load_dataset
from artgraph_tpu.models import ResnetMultiTask, ViTMultiTask
from artgraph_tpu.tracking import tracker_multitask
from artgraph_tpu.train import EarlyStopping
from artgraph_tpu.train.trainer import Trainer, adam


def main(argv=None):
    parser = get_base_arguments()
    parser.add_argument('--architecture', type=str, default='resnet',
                        help='Architecture (vit|resnet).')
    parser.add_argument('--dropout', type=float, default=0.4, help='Dropout.')
    args = parser.parse_args(argv)
    print(args)

    dataset_train, dataset_valid, dataset_test = load_dataset(
        base_dir=args.dataset_path, image_dir=args.image_path,
        mode='multi_task', transform_type=args.architecture)
    mesh = make_mesh(args)
    loaders = make_loaders({'train': dataset_train, 'valid': dataset_valid,
                            'test': dataset_test}, args.batch, args.num_workers,
                           cache_dir=args.image_cache,
                           resident=args.resident_data, mesh=mesh,
                           epoch_scan=not args.no_epoch_scan)

    if args.architecture == 'resnet':
        model = ResnetMultiTask(NUM_CLASSES, args.dropout)
        model_name = 'ResnetMultiTask'
    else:
        model = ViTMultiTask(NUM_CLASSES, args.dropout)
        model_name = 'ViTMultiTask'

    if args.with_weights:
        cw_style = get_class_weights(dataset_train, NUM_CLASSES['style'], 'style')
        cw_genre = get_class_weights(dataset_train, NUM_CLASSES['genre'], 'genre')
    else:
        cw_style = cw_genre = None

    trainer = Trainer(
        model=model,
        optimizer=adam(args.lr),
        forward_inputs=lambda img, batch: (img,),
        compute_loss=multi_task_loss(cw_style, cw_genre, 0.6, 0.4),
        transform_type=args.architecture,
        mesh=mesh,
        seed=config.GLOBAL_SEED,
    )
    state = trainer.init(next(iter(loaders['train'])))
    state = maybe_warm_start(args, trainer, state, model_name)

    # reference keeps 'single-task' in this checkpoint name (ref :48)
    checkpoint_name = os.path.join(
        config.CHECKPOINTS_DIR,
        f'{args.architecture}_baseline_single-task_checkpoint.pt')
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
