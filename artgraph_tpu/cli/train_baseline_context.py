"""ContextNet / MultiModal ("sansaro") single-task contextual trainer.

CLI-compatible rebuild of ref src/train_baseline_context.py: joint loss
lambda*CE + (1-lambda)*encoder_loss where
  context-net: SmoothL1 + SGD(momentum 0.9) + lambda 0.9  (ref :47-50)
  multi-modal: MSE + Adam + lambda 0.6                    (ref :51-54)
Training consumes (image, embedding, label); valid/test are image-only — the
logits path needs no embedding at eval (ref: utils.py:111-116).
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
from artgraph_tpu.models import ContextNetSingleTask, MultiModalSingleTask
from artgraph_tpu.tracking import tracker
from artgraph_tpu.train import EarlyStopping, cross_entropy, mse, smooth_l1
from artgraph_tpu.train.trainer import Trainer, accuracy_metrics, adam, sgd_momentum

NETS = {
    'context-net': (ContextNetSingleTask, 'ContextNetSingleTask'),
    'multi-modal': (MultiModalSingleTask, 'MultiModalSingleTask'),
}


def main(argv=None):
    parser = get_base_arguments()
    parser.add_argument('--net', type=str, default='multi-modal',
                        help='The architecture. Options: (context-net|multi-modal)')
    parser.add_argument('--label', type=str, default='genre',
                        help='Label to predict. Options: (style|genre).')
    parser.add_argument('--emb_type', type=str, default='artwork',
                        help='Embedding type. Options: (artwork|style|genre).')
    parser.add_argument('--emb_train', type=str,
                        default='gnn_artwork_genre_embs_graph.pt',
                        help='Embedding train file.')
    args = parser.parse_args(argv)
    assert args.net in NETS

    dataset_train, dataset_valid, dataset_test = load_dataset_multimodal(
        base_dir=args.dataset_path, image_dir=args.image_path,
        mode='single_task', label=args.label, emb_type=args.emb_type,
        emb_train=args.emb_train)
    mesh = make_mesh(args)
    loaders = make_loaders({'train': dataset_train, 'valid': dataset_valid,
                            'test': dataset_test}, args.batch, args.num_workers,
                           cache_dir=args.image_cache,
                           resident=args.resident_data, mesh=mesh,
                           epoch_scan=not args.no_epoch_scan)

    num_class = NUM_CLASSES[args.label]
    model_cls, model_name = NETS[args.net]
    model = model_cls(emb_size=config.EMB_SIZE, num_class=num_class)

    class_weights = (get_class_weights(dataset_train, num_class, args.label)
                     if args.with_weights else None)
    cw = None if class_weights is None else jnp.asarray(class_weights)

    if args.net == 'context-net':
        encoder_criterion, optimizer, lamb = smooth_l1, sgd_momentum(args.lr), 0.9
    else:
        encoder_criterion, optimizer, lamb = mse, adam(args.lr), 0.6

    def train_loss(outputs, batch):
        # train batch: (img, embedding, label, mask)
        out, graph_proj = outputs
        _, embeddings, labels, mask = batch
        class_loss = cross_entropy(out, labels, class_weights=cw, mask=mask)
        encoder_loss = encoder_criterion(graph_proj, embeddings, mask=mask)
        loss = lamb * class_loss + (1 - lamb) * encoder_loss
        return loss, accuracy_metrics(out, labels, mask)

    def eval_loss(outputs, batch):
        # valid/test batch: (img, label, mask); loss is CE only (ref :98-105)
        out, _ = outputs
        labels, mask = batch[-2], batch[-1]
        return (cross_entropy(out, labels, class_weights=cw, mask=mask),
                accuracy_metrics(out, labels, mask))

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

    checkpoint_name = os.path.join(
        config.CHECKPOINTS_DIR,
        f'{args.label}_{args.net}_single-task_checkpoint.pt')
    early_stop = EarlyStopping(patience=1, min_delta=0.001,
                               checkpoint_path=checkpoint_name,
                               save_fn=checkpoint_saver(trainer, model_name))

    @tracker(args.tracking, 'train')
    def train(box, epoch):
        box[0], m = trainer.train_epoch(box[0], loaders['train'])
        return m['loss'], m['correct'], epoch

    @tracker(args.tracking, 'valid')
    def valid(box, epoch):
        m = trainer.eval_epoch(box[0], loaders['valid'])
        early_stop(m['loss'], box[0])
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
                               results_dir=args.results_dir, output_index=0)
    print(f'Test accuracy: {acc}')
    log_test_metric(args, 'test acc', acc)
    return acc


if __name__ == '__main__':
    main()
