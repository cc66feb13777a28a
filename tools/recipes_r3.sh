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
# Each family phase (4x/3x/2x/unet) is composed of individually
# invocable stages (4x_s1, 4x_polish, 4x_gan, ...) so an interrupted
# queue resumes mid-chain.  Every stage trains from the offline uint8
# sample cache (device-resident fast path) with the NaN/spike rewind
# guard on (the default) and early stopping on the eval-PSNR plateau.
set -euo pipefail
cd "$(dirname "$0")/.."
SELF="tools/recipes_r3.sh"

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

# ---- 4X: published-checkpoint preset, 96ch / 40-layer Ctrl body (13.4M)
4x) bash $SELF 4x_s1 && bash $SELF 4x_polish && bash $SELF 4x_gan ;;
4x_s1)
  python -m ultrazoom_tpu.train.pretrain --auto_resume --device_data_budget_gib 6 --arch ctrl \
    --num_channels 96 --num_encoder_layers 40 --upscale_ratio 4 \
    --train_images_path $CACHE/train_4x --test_images_path $CACHE/eval_4x \
    --loss_combiner adaptive --num_epochs 100 --early_stop_patience 8 --lr_schedule cosine --remat_policy hidden \
    --checkpoint_path $CKPT/r3_4x_s1 --run_dir_path runs/r3_4x_s1 --seed 300 ;;
4x_polish)
  python -m ultrazoom_tpu.train.pretrain --auto_resume --device_data_budget_gib 6 --arch ctrl \
    --num_channels 96 --num_encoder_layers 40 --upscale_ratio 4 \
    --train_images_path $CACHE/train_4x --test_images_path $CACHE/eval_4x \
    --loss_combiner pixel_ssim --num_epochs 30 --early_stop_patience 5 --upscaler_learning_rate 5e-5 \
    --remat_policy hidden --init_params_from $CKPT/r3_4x_s1 \
    --checkpoint_path $CKPT/r3_4x_polish --run_dir_path runs/r3_4x_polish \
    --seed 310 ;;
4x_gan)
  python -m ultrazoom_tpu.train.finetune --auto_resume --device_data_budget_gib 6 --base_checkpoint_path $CKPT/r3_4x_polish \
    --target_resolution 256 \
    --train_images_path $CACHE/train_4x --test_images_path $CACHE/eval_4x \
    --critic_model_size small --num_epochs 6 \
    --checkpoint_path $CKPT/r3_4x_gan --run_dir_path runs/r3_4x_gan --seed 320 ;;

# ---- 3X: 54ch / 30-layer (3.2M); 252 targets (divisible by 3)
3x) bash $SELF 3x_s1 && bash $SELF 3x_polish && bash $SELF 3x_gan ;;
3x_s1)
  python -m ultrazoom_tpu.train.pretrain --auto_resume --device_data_budget_gib 6 --arch ctrl \
    --num_channels 54 --num_encoder_layers 30 --upscale_ratio 3 \
    --target_resolution 252 \
    --train_images_path $CACHE/train_3x --test_images_path $CACHE/eval_3x \
    --loss_combiner balanced --num_epochs 100 --early_stop_patience 8 --lr_schedule cosine --cosine_epochs 72 \
    --remat_policy hidden \
    --checkpoint_path $CKPT/r3_3x_s1 --run_dir_path runs/r3_3x_s1 --seed 300 ;;
3x_polish)
  python -m ultrazoom_tpu.train.pretrain --auto_resume --device_data_budget_gib 6 --arch ctrl \
    --num_channels 54 --num_encoder_layers 30 --upscale_ratio 3 \
    --target_resolution 252 \
    --train_images_path $CACHE/train_3x --test_images_path $CACHE/eval_3x \
    --loss_combiner pixel --num_epochs 30 --early_stop_patience 5 --upscaler_learning_rate 5e-5 \
    --remat_policy hidden --init_params_from $CKPT/r3_3x_s1 \
    --checkpoint_path $CKPT/r3_3x_polish --run_dir_path runs/r3_3x_polish \
    --seed 310 ;;
3x_gan)
  python -m ultrazoom_tpu.train.finetune --auto_resume --device_data_budget_gib 6 --base_checkpoint_path $CKPT/r3_3x_polish \
    --target_resolution 252 \
    --train_images_path $CACHE/train_3x --test_images_path $CACHE/eval_3x \
    --critic_model_size small --num_epochs 6 \
    --checkpoint_path $CKPT/r3_3x_gan --run_dir_path runs/r3_3x_gan --seed 320 ;;

# ---- 2X: 48ch / 20-layer (1.7M)
2x) bash $SELF 2x_s1 && bash $SELF 2x_polish && bash $SELF 2x_gan ;;
2x_s1)
  python -m ultrazoom_tpu.train.pretrain --auto_resume --device_data_budget_gib 6 --arch ctrl \
    --num_channels 48 --num_encoder_layers 20 --upscale_ratio 2 \
    --train_images_path $CACHE/train_2x --test_images_path $CACHE/eval_2x \
    --loss_combiner balanced --num_epochs 100 --early_stop_patience 8 --lr_schedule cosine --cosine_epochs 72 \
    --remat_policy hidden \
    --checkpoint_path $CKPT/r3_2x_s1 --run_dir_path runs/r3_2x_s1 --seed 300 ;;
2x_polish)
  python -m ultrazoom_tpu.train.pretrain --auto_resume --device_data_budget_gib 6 --arch ctrl \
    --num_channels 48 --num_encoder_layers 20 --upscale_ratio 2 \
    --train_images_path $CACHE/train_2x --test_images_path $CACHE/eval_2x \
    --loss_combiner pixel --num_epochs 30 --early_stop_patience 5 --upscaler_learning_rate 5e-5 \
    --remat_policy hidden --init_params_from $CKPT/r3_2x_s1 \
    --checkpoint_path $CKPT/r3_2x_polish --run_dir_path runs/r3_2x_polish \
    --seed 310 ;;
2x_gan)
  python -m ultrazoom_tpu.train.finetune --auto_resume --device_data_budget_gib 6 --base_checkpoint_path $CKPT/r3_2x_polish \
    --target_resolution 256 \
    --train_images_path $CACHE/train_2x --test_images_path $CACHE/eval_2x \
    --critic_model_size small --num_epochs 6 \
    --checkpoint_path $CKPT/r3_2x_gan --run_dir_path runs/r3_2x_gan --seed 320 ;;

# ---- 0.3.0 flagship (56M), 2X.  The round-2 NaN-file soak: no
#      --debug_nans; the spike/NaN rewind guard (default-on) is the net.
#      12k-sample cap: 56M params + optimizer + remat'd activations need
#      the HBM headroom a full 5.9 GiB resident cache would eat.
#      Peak lr 1e-4: the first 3e-4 soak diverged at epoch 4 (finite
#      spike, guard-reproduced bit-exactly); the forensic A/C/D replays
#      (tools/forensic_balanced.py) pinned it on edge-of-stability lr —
#      the identical state+data is stable at constant 1e-4 — matching the
#      epoch-57 lr-sensitivity result from the late-training forensics.
unet) bash $SELF unet_s1 && bash $SELF unet_polish ;;
unet_s1)
  python -m ultrazoom_tpu.train.pretrain --auto_resume --device_data_budget_gib 6 --max_train_samples 12000 --arch unet --upscale_ratio 2 \
    --train_images_path $CACHE/train_2x --test_images_path $CACHE/eval_2x \
    --loss_combiner balanced --upscaler_learning_rate 1e-4 \
    --num_epochs 24 --early_stop_patience 3 --lr_schedule cosine --cosine_epochs 20 \
    --activation_checkpointing \
    --checkpoint_path $CKPT/r3_unet_s1 --run_dir_path runs/r3_unet_s1 \
    --seed 300 ;;
unet_polish)
  python -m ultrazoom_tpu.train.pretrain --auto_resume --device_data_budget_gib 6 --max_train_samples 12000 --arch unet --upscale_ratio 2 \
    --train_images_path $CACHE/train_2x --test_images_path $CACHE/eval_2x \
    --loss_combiner pixel --num_epochs 12 --early_stop_patience 3 --upscaler_learning_rate 5e-5 \
    --activation_checkpointing --init_params_from $CKPT/r3_unet_s1 \
    --checkpoint_path $CKPT/r3_unet_polish --run_dir_path runs/r3_unet_polish \
    --seed 310 ;;

*) echo "unknown phase: $1" >&2; exit 2 ;;
esac
