"""ContextNet / MultiModal multi-task contextual trainer.

CLI-compatible rebuild of ref src/train_baseline_context_multitask.py:
train loss = lambda*(0.5*CE_style + 0.5*CE_genre) + (1-lambda)*encoder_loss
(ref :78-81). The reference's valid() references an undefined
`class_criterion` (NameError if run, ref :109-110 — SURVEY.md §7 quirk list);
we use the defined per-task criteria (0.5/0.5), the evident intent.
"""
from __future__ import annotations

import os

import jax.numpy as jnp

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
)
from artgraph_tpu.data import get_class_weights, load_dataset_multimodal
from artgraph_tpu.models import ContextNetlMultiTask, MultiModalMultiTask
from artgraph_tpu.tracking import tracker_multitask
from artgraph_tpu.train import EarlyStopping, cross_entropy, mse, smooth_l1
from artgraph_tpu.train.trainer import Trainer, accuracy_metrics, adam, sgd_momentum

NETS = {
    'context-net': (ContextNetlMultiTask, 'ContextNetlMultiTask'),
    'multi-modal': (MultiModalMultiTask, 'MultiModalMultiTask'),
}


def main(argv=None):
    parser = get_base_arguments()
    parser.add_argument('--net', type=str, default='multi-modal',
                        help='The architecture. Options: (context-net|multi-modal)')
    parser.add_argument('--emb_type', type=str, default='artwork',
                        help='Embedding type. Options: (artwork|style|genre).')
    parser.add_argument('--emb_train', type=str,
                        default='node2vec_artwork_embs_graph.pt',
                        help='Embedding train file.')  # ref default, :16
    args = parser.parse_args(argv)
    assert args.net in NETS

    dataset_train, dataset_valid, dataset_test = load_dataset_multimodal(
        base_dir=args.dataset_path, image_dir=args.image_path,
        mode='multi_task', emb_type=args.emb_type, emb_train=args.emb_train)
    mesh = make_mesh(args)
    loaders = make_loaders({'train': dataset_train, 'valid': dataset_valid,
                            'test': dataset_test}, args.batch, args.num_workers,
                           cache_dir=args.image_cache,
                           resident=args.resident_data, mesh=mesh,
                           epoch_scan=not args.no_epoch_scan)

    model_cls, model_name = NETS[args.net]
    model = model_cls(emb_size=config.EMB_SIZE, num_classes=NUM_CLASSES)

    if args.with_weights:
        cw_s = jnp.asarray(get_class_weights(dataset_train, NUM_CLASSES['style'], 'style'))
        cw_g = jnp.asarray(get_class_weights(dataset_train, NUM_CLASSES['genre'], 'genre'))
    else:
        cw_s = cw_g = None

    if args.net == 'context-net':
        encoder_criterion, optimizer, lamb = smooth_l1, sgd_momentum(args.lr), 0.9
    else:
        encoder_criterion, optimizer, lamb = mse, adam(args.lr), 0.6

    def class_losses(outs, labels, mask):
        style_loss = 0.5 * cross_entropy(outs[0], labels[:, 0], cw_s, mask)
        genre_loss = 0.5 * cross_entropy(outs[1], labels[:, 1], cw_g, mask)
        metrics = accuracy_metrics(outs[0], labels[:, 0], mask, 'style_')
        metrics.update(accuracy_metrics(outs[1], labels[:, 1], mask, 'genre_'))
        return style_loss + genre_loss, metrics

    def train_loss(outputs, batch):
        # train batch: (img, embedding, labels[:,2], mask)
        outs, graph_proj = outputs
        _, embeddings, labels, mask = batch
        cls_loss, metrics = class_losses(outs, labels, mask)
        encoder_loss = encoder_criterion(graph_proj, embeddings, mask=mask)
        return lamb * cls_loss + (1 - lamb) * encoder_loss, metrics

    def eval_loss(outputs, batch):
        # valid/test batch: (img, labels, mask)
        outs, _ = outputs
        labels, mask = batch[-2], batch[-1]
        return class_losses(outs, labels, mask)

    trainer = Trainer(
        model=model,
        optimizer=optimizer,
        forward_inputs=lambda img, batch: (img,),
        compute_loss=train_loss,
        eval_compute_loss=eval_loss,
        transform_type='resnet',
        mesh=mesh,
        seed=config.GLOBAL_SEED,
    )
    state = trainer.init(next(iter(loaders['train'])))
    state = maybe_warm_start(args, trainer, state, model_name)

    checkpoint_name = os.path.join(config.CHECKPOINTS_DIR,
                                   f'{args.net}_multi-task_checkpoint.pt')
    early_stop = EarlyStopping(patience=1, min_delta=0.001,
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
                                     output_index=(0, 0), suffix='_style')
    genre_acc = evaluate_single_task(trainer, state, loaders['test'],
                                     NUM_CLASSES['genre'], args.results_dir,
                                     output_index=(0, 1), suffix='_genre')
    print(f'Test style accuracy: {style_acc}; test genre accuracy: {genre_acc}')
    log_test_metric(args, 'test style acc', style_acc)
    log_test_metric(args, 'test genre acc', genre_acc)
    return style_acc, genre_acc


if __name__ == '__main__':
    main()
