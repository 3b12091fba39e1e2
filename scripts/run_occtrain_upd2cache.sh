#!/bin/bash
# Measured arm for the last unmeasured occ-train knob pair:
# --occupancy_train_update 2 (grid re-baked every 2nd epoch) composed with
# --occupancy_train_cache (per-image probe rows cached against each bake;
# bit-identical sampling — test_occupancy_train_cached_rows_step_is_bit_identical).
# Same compressed 100-epoch recipe as the QUALITY.md 128^2 no-merge row
# (assets/occtrain_nomerge_run.log) so the PSNR/throughput deltas are
# attributable to the two knobs alone.
set -e
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
python -c "
import os
from keras_nerf_tpu.data.synthetic import write_synthetic_scene
if not os.path.exists('data/synthetic_128/transforms_train.json'):
    write_synthetic_scene('data/synthetic_128', image_wh=128,
                          n_train=100, n_val=8, n_test=8, supersample=4)
    print('scene written')
else:
    print('scene exists')
"
exec timeout -k 10 3000 python train_single.py --name occtrain_upd2cache \
  --data_dir data/synthetic_128 --img_wh 128 --white_bg \
  --num_epochs 100 --batch_size 1 --ray_chunks 16384 \
  --learning_rate 5e-4 --lr_final 5e-6 --log_freq 10 \
  --occupancy_train 128 --occupancy_train_samples 64 \
  --occupancy_train_warmup 2 --occupancy_train_no_merge \
  --occupancy_train_update 2 --occupancy_train_cache \
  --model_dirs model --log_dir logs \
  2>&1 | tee assets/occtrain_upd2cache_run.log
