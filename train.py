"""Multi-device (data-parallel) training CLI.

Rebuild of the reference `train.py` (`/root/reference/train.py:13-166`): the
``tf.distribute.MirroredStrategy`` + tf.data auto-sharding stack becomes a
``jax.sharding.Mesh`` + shard_map data-parallel train step with psum'd
gradients over the TPU ICI (see ``keras_nerf_tpu/parallel/``). Flag surface
and semantics are preserved: ``global_batch = batch_size * num_devices``
(`train.py:84`), ``--ray_chunks`` is per-device, resume from the monitor
checkpoint, final save to ``{model_dirs}/{name}``.

``--num_gpus`` is kept for CLI compatibility; like the reference (where it is
parsed but unused, `train.py:44` / SURVEY.md §7 quirks) the device count
comes from the runtime — here it CAN be used to restrict the mesh.
"""

import argparse
import logging

from train_single import run_training


def main():
    parser = argparse.ArgumentParser()
    # NeRF Dataset Directory
    parser.add_argument('--name', type=str, default='lego',
                        help='Name of the nerf model')
    parser.add_argument('--data_dir', type=str,
                        default='data/nerf_synthetic/lego')

    # NeRF Model Parameters
    parser.add_argument('--num_coarse_samples', type=int, default=64)
    parser.add_argument('--num_fine_samples', type=int, default=128)
    parser.add_argument('--pos_emb_xyz', type=int, default=10)
    parser.add_argument('--pos_emb_dir', type=int, default=4)
    parser.add_argument('--num_layers', type=int, default=8)
    parser.add_argument('--num_units', type=int, default=256)
    parser.add_argument('--skip_layer', type=int, default=4)

    # NeRF Dataset Parameters
    parser.add_argument('--img_wh', type=int, default=512)
    parser.add_argument('--near', type=float, default=2.0)
    parser.add_argument('--far', type=float, default=6.0)
    parser.add_argument('--white_bg', action='store_true')

    # NeRF Training Parameters
    parser.add_argument('--num_epochs', type=int, default=250)
    parser.add_argument('--batch_size', type=int, default=1,
                        help='PER-DEVICE batch size; global batch is '
                             'batch_size * num_devices')
    parser.add_argument('--num_gpus', type=int, default=0,
                        help='restrict the mesh to the first N devices '
                             '(0 = all devices)')
    parser.add_argument('--n_slices', type=int, default=1,
                        help='multi-slice pods: shard the batch over a 2-D '
                             '(replica, data) mesh with this many slices '
                             'outermost, so the outer all-reduce hop rides '
                             'DCN and the inner ICI '
                             '(parallel/data_parallel.py: make_mesh)')
    parser.add_argument('--shard_rays', action='store_true',
                        help='ray-sharded DP: split the image HEIGHT axis '
                             'across the mesh instead of the image-batch '
                             'axis. Global batch stays batch_size (NOT '
                             'batch_size * num_devices), so the optimizer '
                             'trajectory follows the measured single-chip '
                             'trajectory at that batch size (same '
                             'global-batch gradient math; fine-pass '
                             'sample draws are decorrelated per band, '
                             'measured <=2%% per-epoch metric drift) — '
                             'the mesh only divides per-step ray work. '
                             'Requires img_wh %% num_devices == 0')
    parser.add_argument('--ray_chunks', type=int, default=1024)
    parser.add_argument('--learning_rate', type=float, default=1e-3)
    parser.add_argument('--lr_final', type=float, default=0.0,
                        help='exponential lr decay target over the full run '
                             '(0 = constant lr like the reference)')
    parser.add_argument('--optimizer', type=str, default='adam')
    parser.add_argument('--mixed_precision', action='store_true')
    parser.add_argument('--seed', type=int, default=42)
    parser.add_argument('--debug_nans', action='store_true')
    parser.add_argument('--profile_dir', type=str, default='')
    parser.add_argument('--use_pallas', action='store_true',
                        help='force the fused Pallas kernels on (default: auto)')
    parser.add_argument('--no_pallas', action='store_true',
                        help='force the pure-XLA path (end-to-end float32 '
                             'matmuls when --mixed_precision is off; the '
                             'fused kernels are bf16-operand/f32-accumulate '
                             'by design)')
    parser.add_argument('--pixel_sampling', action='store_true',
                        help='train on random rays drawn across ALL images '
                             'per step instead of whole-image batches '
                             '(faster wall-clock convergence; the original '
                             'NeRF paper trains this way). Val/test metrics '
                             'stay whole-image')
    parser.add_argument('--resize_method', type=str, default='lanczos',
                        choices=['lanczos', 'antialias-bilinear'],
                        help='image resize filter; antialias-bilinear matches '
                             'the reference tf.image.resize exactly')
    parser.add_argument('--occupancy_train', type=int, default=0,
                        help='OPT-IN acceleration (see train_single.py): '
                             'train the fine pass on grid-placed depths; '
                             'under the mesh the grid is baked once per '
                             'epoch and replicated. 0 = off')
    parser.add_argument('--occupancy_train_samples', type=int, default=64)
    parser.add_argument('--occupancy_train_warmup', type=int, default=2)
    parser.add_argument('--occupancy_train_probe', type=int, default=64)
    parser.add_argument('--occupancy_train_no_merge', action='store_true')
    parser.add_argument('--occupancy_train_until', type=int, default=0,
                        help='hybrid schedule: occupancy-placed fine '
                             'samples until this epoch, exact math after '
                             '(see train_single.py). 0 = whole run')
    parser.add_argument('--occupancy_train_dilate', type=int, default=1,
                        help='dilation iterations for the baked training '
                             'grid; raise to 2-3 on thin/sub-voxel '
                             'geometry (see train_single.py)')
    parser.add_argument('--occupancy_train_update', type=int, default=1,
                        help='re-bake the training occupancy grid every N '
                             'epochs (see train_single.py). 1 = every '
                             'epoch (default)')
    parser.add_argument('--debug_grads', action='store_true',
                        help='per-variable gradient-norm diagnostics '
                             '(see train_single.py); debug only')

    # NeRF Logging Parameters
    parser.add_argument('--model_dirs', type=str, default='model')
    parser.add_argument('--log_dir', type=str, default='logs')
    parser.add_argument('--log_freq', type=int, default=5)
    parser.add_argument('--verbose', action='store_true')
    args = parser.parse_args()
    args.eagerly = False  # multi-device path is always jitted
    if args.shard_rays and args.pixel_sampling:
        parser.error('--shard_rays cannot compose with --pixel_sampling '
                     '(pixel batches have no image-height axis to split; '
                     'plain DP already shards them)')

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format='%(asctime)s | %(name)s | %(levelname)s | %(message)s')

    import jax

    from keras_nerf_tpu.parallel import make_mesh

    n = args.num_gpus if args.num_gpus > 0 else len(jax.devices())
    mesh = make_mesh(n, n_slices=args.n_slices)
    logging.info('Devices (%s mesh): %s', dict(zip(mesh.axis_names,
                                                   mesh.devices.shape)),
                 mesh.devices.ravel().tolist())
    run_training(args, mesh=mesh)


if __name__ == '__main__':
    main()
