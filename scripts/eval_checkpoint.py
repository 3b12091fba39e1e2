"""Evaluate a saved checkpoint on a dataset's held-out splits.

The reference never evaluates its test split (its `inference.py` only
renders orbit GIFs); this repo's `train_single.py` logs final test metrics
at the end of a run (`train_single.py:290-293`). This script reproduces
that evaluation for any saved model dir after the fact, so A/B arms can be
compared on identical test math without re-training.

Usage:
    python scripts/eval_checkpoint.py --model_path model/quality128_hard \
        --data_dir data/hard_128 --img_wh 128 --white_bg [--split test]

Prints one line per metric and a final one-line JSON record.
"""

import argparse
import json
import logging
import sys

sys.path.insert(0, "/root/repo")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model_path', type=str, required=True,
                        help='dir with model_config.json + *.msgpack')
    parser.add_argument('--data_dir', type=str, required=True)
    parser.add_argument('--img_wh', type=int, default=128)
    parser.add_argument('--near', type=float, default=2.0)
    parser.add_argument('--far', type=float, default=6.0)
    parser.add_argument('--white_bg', action='store_true')
    parser.add_argument('--batch_size', type=int, default=1)
    parser.add_argument('--ray_chunks', type=int, default=16384)
    parser.add_argument('--split', type=str, default='test',
                        choices=['train', 'val', 'test'])
    parser.add_argument('--resize_method', type=str, default='lanczos',
                        choices=['lanczos', 'antialias-bilinear'])
    parser.add_argument('--seed', type=int, default=42)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s | %(levelname)s | %(message)s')

    from keras_nerf_tpu.data import DatasetLoader
    from keras_nerf_tpu.models import NeRF

    nerf = NeRF(model_path=args.model_path)
    loader = DatasetLoader(args.data_dir, args.white_bg,
                           resize_method=args.resize_method)
    splits = loader.load_dataset(
        batch_size=args.batch_size,
        image_width=args.img_wh, image_height=args.img_wh,
        near=args.near, far=args.far,
        n_sample=nerf.config.n_coarse, seed=args.seed)
    dataset = dict(zip(('train', 'val', 'test'), splits))[args.split]

    nerf.compile(loss='mse', batch_size=args.batch_size,
                 image_height=args.img_wh, image_width=args.img_wh,
                 ray_chunks=args.ray_chunks,
                 white_background=args.white_bg,
                 is_training=False, seed=args.seed)
    metrics = nerf.evaluate(dataset)
    for k, v in metrics.items():
        logging.info('%s %s = %.4f', args.split, k, v)
    print(json.dumps({'model_path': args.model_path, 'split': args.split,
                      **{k: round(float(v), 4) for k, v in metrics.items()}}))


if __name__ == '__main__':
    main()
