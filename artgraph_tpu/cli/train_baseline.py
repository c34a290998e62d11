"""Image-only single-task baseline trainer.

CLI-compatible rebuild of ref src/train_baseline.py: same flags
(--label, --architecture, --dropout + base args), checkpoint name, patience
(10), loss (CE + optional class weights), Adam, and print/MLflow surface.
The TPU differences: bf16 jitted train step, uint8 device pipeline, optional
--data_parallel mesh.
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
from artgraph_tpu.data import get_class_weights, load_dataset
from artgraph_tpu.models import ResnetSingleTask, ViTSingleTask
from artgraph_tpu.tracking import tracker
from artgraph_tpu.train import EarlyStopping
from artgraph_tpu.train.trainer import Trainer, adam


def main(argv=None):
    parser = get_base_arguments()
    parser.add_argument('--label', type=str, default='genre',
                        help='Label to predict (style|genre).')
    parser.add_argument('--architecture', type=str, default='resnet',
                        help='Architecture (vit|resnet).')
    parser.add_argument('--dropout', type=float, default=0.4, help='Dropout.')
    args = parser.parse_args(argv)
    print(args)

    dataset_train, dataset_valid, dataset_test = load_dataset(
        base_dir=args.dataset_path, image_dir=args.image_path,
        mode='single_task', label=args.label, transform_type=args.architecture)
    mesh = make_mesh(args)
    loaders = make_loaders({'train': dataset_train, 'valid': dataset_valid,
                            'test': dataset_test}, args.batch, args.num_workers,
                           cache_dir=args.image_cache,
                           resident=args.resident_data, mesh=mesh,
                           epoch_scan=not args.no_epoch_scan)

    num_class = NUM_CLASSES[args.label]
    if args.architecture == 'resnet':
        model = ResnetSingleTask(num_class, args.dropout)
        model_name = 'ResnetSingleTask'
    else:
        model = ViTSingleTask(num_class, args.dropout)
        model_name = 'ViTSingleTask'

    class_weights = (get_class_weights(dataset_train, num_class, args.label)
                     if args.with_weights else None)

    trainer = Trainer(
        model=model,
        optimizer=adam(args.lr),
        forward_inputs=lambda img, batch: (img,),
        compute_loss=single_task_loss(class_weights),
        transform_type=args.architecture,
        mesh=mesh,
        seed=config.GLOBAL_SEED,
    )
    state = trainer.init(next(iter(loaders['train'])))
    state = maybe_warm_start(args, trainer, state, model_name)

    checkpoint_name = os.path.join(
        config.CHECKPOINTS_DIR,
        f'{args.label}_{args.architecture}_baseline_single-task_checkpoint.pt')
    early_stop = EarlyStopping(patience=10, min_delta=0.001,
                               checkpoint_path=checkpoint_name,
                               save_fn=checkpoint_saver(trainer, model_name))

    @tracker(args.tracking, 'train')
    def train(state_box, epoch):
        state_box[0], m = trainer.train_epoch(state_box[0], loaders['train'])
        return m['loss'], m['correct'], epoch

    @tracker(args.tracking, 'valid')
    def valid(state_box, epoch):
        m = trainer.eval_epoch(state_box[0], loaders['valid'])
        early_stop(m['loss'], state_box[0])
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

    # test(): fresh state from the best checkpoint (ref: train_baseline.py:102-128)
    state = reload_state(trainer, model_name, checkpoint_name)
    acc = evaluate_single_task(trainer, state, loaders['test'], num_class,
                               results_dir=args.results_dir)
    print(f'Test accuracy: {acc}')
    log_test_metric(args, 'test acc', acc)
    return acc


if __name__ == '__main__':
    main()
