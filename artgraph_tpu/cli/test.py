"""Tracking smoke script (ref: src/test.py — the reference's only
'test'-named file): exercises the tracking decorator with fake losses."""
from __future__ import annotations

import argparse
import random

from artgraph_tpu.tracking import tracker, track_params


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--exp', type=str, default='test', help='Experiment name.')
    parser.add_argument('-t', '--tracking', action='store_true')
    args = parser.parse_args(argv)

    if args.tracking:
        track_params(args)

    @tracker(args.tracking, 'train')
    def fake_epoch(epoch):
        return random.random(), random.random(), epoch

    for epoch in range(5):
        loss, acc, _ = fake_epoch(epoch)
        print(f'epoch {epoch}: loss={loss:.4f} acc={acc:.4f}')


if __name__ == '__main__':
    main()
