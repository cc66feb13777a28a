#!/usr/bin/env bash
# Round-3 retraining recipes: the 12.7x-larger procedural corpus.
#
# Data prep (run once; ~2h CPU on this host):
#   python -m ultrazoom_tpu.tools.make_demo_dataset --out dataset_r3 \
#       --n_train 3000 --n_test 60 --seed 300
#   bash tools/recipes_r3.sh caches
#   bash tools/recipes_r3.sh pairs
#
# Training queue (one v5e chip, sequential):
#   bash tools/recipes_r3.sh 4x     # weakest round-2 artifact first
#   bash tools/recipes_r3.sh 3x
#   bash tools/recipes_r3.sh 2x
#   bash tools/recipes_r3.sh unet   # 56M flagship soak, no --debug_nans
#
# Every stage trains from the offline uint8 sample cache (device-resident
# fast path) with the NaN/spike rewind guard on (the default).
set -euo pipefail
cd "$(dirname "$0")/.."

DS=dataset_r3
CACHE=cache_r3
CKPT=checkpoints
VARIANTS=8          # 8 unique degradation epochs per image, cycled
DEG="--min_gaussian_blur 0.0 --max_gaussian_blur 1.0 \
     --min_gaussian_noise 0.0 --max_gaussian_noise 0.1 \
     --min_compression 0.0 --max_compression 0.8"

build_cache() { # ratio
  local r=$1 res=256
  [ "$r" = 3 ] && res=252   # target must divide by the ratio
  python -m ultrazoom_tpu.tools.cache_dataset --images_path $DS/train \
    --out $CACHE/train_${r}x --upscale_ratio "$r" --num_variants $VARIANTS \
    --target_resolution $res $DEG --seed 300
  python -m ultrazoom_tpu.tools.cache_dataset --images_path $DS/test \
    --out $CACHE/eval_${r}x --upscale_ratio "$r" --num_variants 1 \
    --target_resolution $res $DEG --eval --seed 301
}

case "${1:?phase}" in
caches) for r in 4 3 2; do build_cache $r; done ;;
pairs)  # fixed-degradation held-out eval pairs (blur .5 noise .05 jpeg .4)
  for r in 2 3 4; do
    python -m ultrazoom_tpu.tools.make_demo_dataset --out pairs_r3_${r}x \
      --pairs_from $DS/test --ratio $r --blur 0.5 --noise 0.05 --jpeg 0.4
  done ;;

4x) # published-checkpoint 4X preset: 96ch / 40-layer Ctrl body (13.4M)
  python -m ultrazoom_tpu.train.pretrain --device_data_budget_gib 6 --arch ctrl \
    --num_channels 96 --num_encoder_layers 40 --upscale_ratio 4 \
    --train_images_path $CACHE/train_4x --test_images_path $CACHE/eval_4x \
    --loss_combiner adaptive --num_epochs 100 --remat_policy hidden \
    --checkpoint_path $CKPT/r3_4x_s1 --run_dir_path runs/r3_4x_s1 --seed 300
  python -m ultrazoom_tpu.train.pretrain --device_data_budget_gib 6 --arch ctrl \
    --num_channels 96 --num_encoder_layers 40 --upscale_ratio 4 \
    --train_images_path $CACHE/train_4x --test_images_path $CACHE/eval_4x \
    --loss_combiner pixel_ssim --num_epochs 30 --upscaler_learning_rate 5e-5 \
    --remat_policy hidden --init_params_from $CKPT/r3_4x_s1 \
    --checkpoint_path $CKPT/r3_4x_polish --run_dir_path runs/r3_4x_polish \
    --seed 310
  python -m ultrazoom_tpu.train.finetune --device_data_budget_gib 6 --base_checkpoint_path $CKPT/r3_4x_polish \
    --train_images_path $CACHE/train_4x --test_images_path $CACHE/eval_4x \
    --critic_model_size small --num_epochs 10 \
    --checkpoint_path $CKPT/r3_4x_gan --run_dir_path runs/r3_4x_gan --seed 320 ;;

3x) # 3X preset: 54ch / 30-layer (3.2M); 252 targets (divisible by 3)
  python -m ultrazoom_tpu.train.pretrain --device_data_budget_gib 6 --arch ctrl \
    --num_channels 54 --num_encoder_layers 30 --upscale_ratio 3 \
    --target_resolution 252 \
    --train_images_path $CACHE/train_3x --test_images_path $CACHE/eval_3x \
    --loss_combiner balanced --num_epochs 100 \
    --checkpoint_path $CKPT/r3_3x_s1 --run_dir_path runs/r3_3x_s1 --seed 300
  python -m ultrazoom_tpu.train.pretrain --device_data_budget_gib 6 --arch ctrl \
    --num_channels 54 --num_encoder_layers 30 --upscale_ratio 3 \
    --target_resolution 252 \
    --train_images_path $CACHE/train_3x --test_images_path $CACHE/eval_3x \
    --loss_combiner pixel --num_epochs 30 --upscaler_learning_rate 5e-5 \
    --init_params_from $CKPT/r3_3x_s1 \
    --checkpoint_path $CKPT/r3_3x_polish --run_dir_path runs/r3_3x_polish \
    --seed 310
  python -m ultrazoom_tpu.train.finetune --device_data_budget_gib 6 --base_checkpoint_path $CKPT/r3_3x_polish \
    --target_resolution 252 \
    --train_images_path $CACHE/train_3x --test_images_path $CACHE/eval_3x \
    --critic_model_size small --num_epochs 10 \
    --checkpoint_path $CKPT/r3_3x_gan --run_dir_path runs/r3_3x_gan --seed 320 ;;

2x) # 2X preset: 48ch / 20-layer (1.7M)
  python -m ultrazoom_tpu.train.pretrain --device_data_budget_gib 6 --arch ctrl \
    --num_channels 48 --num_encoder_layers 20 --upscale_ratio 2 \
    --train_images_path $CACHE/train_2x --test_images_path $CACHE/eval_2x \
    --loss_combiner balanced --num_epochs 100 \
    --checkpoint_path $CKPT/r3_2x_s1 --run_dir_path runs/r3_2x_s1 --seed 300
  python -m ultrazoom_tpu.train.pretrain --device_data_budget_gib 6 --arch ctrl \
    --num_channels 48 --num_encoder_layers 20 --upscale_ratio 2 \
    --train_images_path $CACHE/train_2x --test_images_path $CACHE/eval_2x \
    --loss_combiner pixel --num_epochs 30 --upscaler_learning_rate 5e-5 \
    --init_params_from $CKPT/r3_2x_s1 \
    --checkpoint_path $CKPT/r3_2x_polish --run_dir_path runs/r3_2x_polish \
    --seed 310
  python -m ultrazoom_tpu.train.finetune --device_data_budget_gib 6 --base_checkpoint_path $CKPT/r3_2x_polish \
    --train_images_path $CACHE/train_2x --test_images_path $CACHE/eval_2x \
    --critic_model_size small --num_epochs 10 \
    --checkpoint_path $CKPT/r3_2x_gan --run_dir_path runs/r3_2x_gan --seed 320 ;;

unet) # 0.3.0 flagship (56M), 2X.  The round-2 NaN-file soak: no
      # --debug_nans; the spike/NaN rewind guard (default-on) is the net.
  python -m ultrazoom_tpu.train.pretrain --device_data_budget_gib 6 --arch unet --upscale_ratio 2 \
    --train_images_path $CACHE/train_2x --test_images_path $CACHE/eval_2x \
    --loss_combiner balanced --num_epochs 60 --activation_checkpointing \
    --checkpoint_path $CKPT/r3_unet_s1 --run_dir_path runs/r3_unet_s1 \
    --seed 300
  python -m ultrazoom_tpu.train.pretrain --device_data_budget_gib 6 --arch unet --upscale_ratio 2 \
    --train_images_path $CACHE/train_2x --test_images_path $CACHE/eval_2x \
    --loss_combiner pixel --num_epochs 30 --upscaler_learning_rate 5e-5 \
    --activation_checkpointing --init_params_from $CKPT/r3_unet_s1 \
    --checkpoint_path $CKPT/r3_unet_polish --run_dir_path runs/r3_unet_polish \
    --seed 310 ;;

*) echo "unknown phase: $1" >&2; exit 2 ;;
esac
