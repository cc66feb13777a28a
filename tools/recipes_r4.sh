#!/usr/bin/env bash
# Round-4 training recipes (one v5e chip, run stages sequentially).
#
#   bash tools/recipes_r4.sh unet_s1      # flagship full-budget stage 1
#   bash tools/recipes_r4.sh unet_polish  # + pixel_ssim polish
#   bash tools/recipes_r4.sh gan_base     # shipped 2X Ctrl artifact -> checkpoint
#   bash tools/recipes_r4.sh ganA|ganB|ganC|ganD   # GAN recipe sweep (2X)
#   bash tools/recipes_r4.sh x8_cache     # tiny x8 cache
#   bash tools/recipes_r4.sh x8_tiny      # tiny x8 end-to-end train
#
# Round-4 goals these implement (VERDICT r3 "Next round" #2, #5, #7):
# - The 56M flagship gets a full-length anneal on the whole 24k-sample
#   cache (round 3 was budget-sized: 12k samples, 18+12 epochs, +0.10 dB).
# - The 2X GAN stage gets a real recipe sweep (critic lr/warmup/size,
#   post-normalisation feature-match/adversarial weights) from the shipped
#   2X Ctrl polish artifact, eval every epoch.
# - x8 is exercised end to end (tiny model, demo corpus).
set -euo pipefail
cd "$(dirname "$0")/.."

DS=dataset_r3
CACHE=cache_r3
CKPT=checkpoints
DEG="--min_gaussian_blur 0.0 --max_gaussian_blur 1.0 \
     --min_gaussian_noise 0.0 --max_gaussian_noise 0.1 \
     --min_compression 0.0 --max_compression 0.8"

GAN_COMMON="--auto_resume --hang_timeout_s 600 --device_data_budget_gib 6 \
    --base_checkpoint_path $CKPT/r4_2x_base --target_resolution 256 \
    --train_images_path $CACHE/train_2x --test_images_path $CACHE/eval_2x \
    --num_epochs 8 --eval_interval 1 --seed 320"

case "$1" in

# ---- 0.3.0 flagship (56M), 2X: full-budget anneal on all 24k samples.
#      Round 3 proved the recipe shape (peak lr 1e-4 after edge-of-
#      stability forensics; cosine horizon decoupled from the epoch
#      budget; early stop deferred until the anneal is ~done) but sized
#      it to the leftover chip budget.  This is the real run.
unet_s1)
  python -m ultrazoom_tpu.train.pretrain --auto_resume --hang_timeout_s 600 --device_data_budget_gib 8 --arch unet --upscale_ratio 2 \
    --train_images_path $CACHE/train_2x --test_images_path $CACHE/eval_2x \
    --loss_combiner balanced --upscaler_learning_rate 1e-4 \
    --num_epochs 56 --early_stop_patience 6 --lr_schedule cosine --cosine_epochs 48 \
    --activation_checkpointing \
    --checkpoint_path $CKPT/r4_unet_s1 --run_dir_path runs/r4_unet_s1 \
    --seed 400 ;;
unet_polish)
  python -m ultrazoom_tpu.train.pretrain --auto_resume --hang_timeout_s 600 --device_data_budget_gib 8 --arch unet --upscale_ratio 2 \
    --train_images_path $CACHE/train_2x --test_images_path $CACHE/eval_2x \
    --loss_combiner pixel_ssim --num_epochs 30 --early_stop_patience 5 --upscaler_learning_rate 5e-5 \
    --activation_checkpointing --init_params_from $CKPT/r4_unet_s1 \
    --checkpoint_path $CKPT/r4_unet_polish --run_dir_path runs/r4_unet_polish \
    --seed 410 ;;

# ---- 2X GAN recipe sweep.  Base = the shipped 2X Ctrl polish artifact
#      (+1.12 dB over bicubic), converted back into a pretrain-style
#      checkpoint.  ganA is the reference-recipe control; B-D vary the
#      critic's strength and the generator's loss weighting toward
#      distortion-friendlier adversarial training.
gan_base)
  python -m ultrazoom_tpu.tools.artifact_to_checkpoint \
    --artifact artifacts/mewzoom-tpu-2x-ctrl --out $CKPT/r4_2x_base ;;
ganA)
  python -m ultrazoom_tpu.train.finetune $GAN_COMMON \
    --critic_model_size small --best_checkpoint_metric vif \
    --checkpoint_path $CKPT/r4_ganA --run_dir_path runs/r4_ganA ;;
ganB)
  python -m ultrazoom_tpu.train.finetune $GAN_COMMON \
    --critic_model_size small --upscaler_learning_rate 2e-5 \
    --critic_learning_rate 2e-4 --critic_warmup_epochs 2 \
    --feature_match_weight 2.0 --adversarial_weight 0.5 \
    --best_checkpoint_metric vif \
    --checkpoint_path $CKPT/r4_ganB --run_dir_path runs/r4_ganB ;;
ganC)
  python -m ultrazoom_tpu.train.finetune $GAN_COMMON \
    --critic_model_size small --upscaler_learning_rate 2e-5 \
    --feature_match_weight 4.0 --adversarial_weight 0.25 \
    --best_checkpoint_metric vif \
    --checkpoint_path $CKPT/r4_ganC --run_dir_path runs/r4_ganC ;;
ganD)
  python -m ultrazoom_tpu.train.finetune $GAN_COMMON \
    --critic_model_size medium --upscaler_learning_rate 5e-5 \
    --critic_learning_rate 2e-4 --critic_warmup_epochs 2 \
    --feature_match_weight 2.0 --adversarial_weight 0.5 \
    --best_checkpoint_metric vif \
    --checkpoint_path $CKPT/r4_ganD --run_dir_path runs/r4_ganD ;;

# ---- ganE: designed from A-D.  A (gen lr 1e-4, equal weights) is the
#      only arm whose VIF moves (+10.8% pairs) but its distortion decay
#      passes the ship bar before the first eval; B/C (gen lr 2e-5) never
#      leave the base.  E keeps A's generator speed and instead bends the
#      trade's slope: pixel anchor x2 + halved adversarial pressure, with
#      best-VIF selection gated on a cache-eval PSNR floor (21.85 maps to
#      ~24.68 on the held-out pairs — just above the 24.641 ship bar).
ganE)
  python -m ultrazoom_tpu.train.finetune $GAN_COMMON \
    --critic_model_size small \
    --pixel_weight 2.0 --adversarial_weight 0.5 \
    --best_checkpoint_metric vif --best_psnr_floor 21.85 \
    --checkpoint_path $CKPT/r4_ganE --run_dir_path runs/r4_ganE ;;

# ---- ganF: the other way to slow A's trade — halve the generator's
#      STRIDE (lr 5e-5) while keeping every loss weight and the critic
#      recipe exactly A's (D confounded its gen-lr cut with damped
#      weights AND a halved critic lr, which collapsed the critic to
#      BCE ln2 — no signal at all).  Same floor-gated selection as E.
ganF)
  python -m ultrazoom_tpu.train.finetune $GAN_COMMON \
    --critic_model_size small --upscaler_learning_rate 5e-5 \
    --best_checkpoint_metric vif --best_psnr_floor 21.85 \
    --checkpoint_path $CKPT/r4_ganF --run_dir_path runs/r4_ganF ;;

# ---- 3X retrain (SUPERSEDED, kept for the record): written on the
#      stale premise that the round-3 3X negative result was still open.
#      It was already closed inside round 3 — the cosine-horizon rerun
#      (`--cosine_epochs 72`, early-stop ep 70) re-shipped the artifact
#      at 23.874/0.5912/0.3962 (commit ccc074e) — so a 44-epoch-horizon
#      rerun would only measure seed noise.  The x4_* stages below apply
#      the same budget to the one family member actually still trained
#      under the truncated-anneal pathology.
x3_s1)
  python -m ultrazoom_tpu.train.pretrain --auto_resume --hang_timeout_s 600 --device_data_budget_gib 6 --arch ctrl \
    --num_channels 54 --num_encoder_layers 30 --upscale_ratio 3 \
    --target_resolution 252 \
    --train_images_path $CACHE/train_3x --test_images_path $CACHE/eval_3x \
    --loss_combiner balanced \
    --num_epochs 60 --early_stop_patience 6 --lr_schedule cosine --cosine_epochs 44 \
    --remat_policy hidden \
    --checkpoint_path $CKPT/r4_3x_s1 --run_dir_path runs/r4_3x_s1 --seed 430 ;;
x3_polish)
  python -m ultrazoom_tpu.train.pretrain --auto_resume --hang_timeout_s 600 --device_data_budget_gib 6 --arch ctrl \
    --num_channels 54 --num_encoder_layers 30 --upscale_ratio 3 \
    --target_resolution 252 \
    --train_images_path $CACHE/train_3x --test_images_path $CACHE/eval_3x \
    --loss_combiner pixel_ssim --num_epochs 30 --early_stop_patience 5 --upscaler_learning_rate 5e-5 \
    --remat_policy hidden --init_params_from $CKPT/r4_3x_s1 \
    --checkpoint_path $CKPT/r4_3x_polish --run_dir_path runs/r4_3x_polish \
    --seed 440 ;;

# ---- 4X corrected-anneal retrain: the shipped 4X (r3, +1.07 dB)
#      early-stopped its adaptive s1 at epoch 56 of a 100-epoch cosine —
#      lr still at ~0.41x peak, the same mid-anneal truncation that cost
#      the first r3 3X run 0.8 dB and the r3 flagship 0.5 dB.  Same fix
#      as both: cosine horizon (56, matching the useful training length
#      r3 demonstrated) sized INSIDE the epoch budget (64) so the anneal
#      completes before early-stop patience (6) can truncate it, then
#      the pixel_ssim polish.  4X is the headline benchmark model.
x4_s1)
  python -m ultrazoom_tpu.train.pretrain --auto_resume --hang_timeout_s 600 --device_data_budget_gib 6 --arch ctrl \
    --num_channels 96 --num_encoder_layers 40 --upscale_ratio 4 \
    --train_images_path $CACHE/train_4x --test_images_path $CACHE/eval_4x \
    --loss_combiner adaptive \
    --num_epochs 64 --early_stop_patience 6 --lr_schedule cosine --cosine_epochs 56 \
    --remat_policy hidden \
    --checkpoint_path $CKPT/r4_4x_s1 --run_dir_path runs/r4_4x_s1 --seed 450 ;;
x4_polish)
  python -m ultrazoom_tpu.train.pretrain --auto_resume --hang_timeout_s 600 --device_data_budget_gib 6 --arch ctrl \
    --num_channels 96 --num_encoder_layers 40 --upscale_ratio 4 \
    --train_images_path $CACHE/train_4x --test_images_path $CACHE/eval_4x \
    --loss_combiner pixel_ssim --num_epochs 30 --early_stop_patience 5 --upscaler_learning_rate 5e-5 \
    --remat_policy hidden --init_params_from $CKPT/r4_4x_s1 \
    --checkpoint_path $CKPT/r4_4x_polish --run_dir_path runs/r4_4x_polish \
    --seed 460 ;;

# ---- x8 end to end (VERDICT r3 #7): tiny U-Net, {2,4,8} ratio support
#      exists in the model; exercise the x8 path beyond shape checks.
x8_cache)
  python -m ultrazoom_tpu.tools.cache_dataset --images_path $DS/train \
    --out $CACHE/train_8x --upscale_ratio 8 --num_variants 2 \
    --target_resolution 256 $DEG --seed 300 --max_images 600
  python -m ultrazoom_tpu.tools.cache_dataset --images_path $DS/test \
    --out $CACHE/eval_8x --upscale_ratio 8 --num_variants 1 \
    --target_resolution 256 $DEG --eval --seed 301 ;;
x8_tiny)
  python -m ultrazoom_tpu.train.pretrain --auto_resume --hang_timeout_s 600 --device_data_budget_gib 4 --arch unet --upscale_ratio 8 \
    --num_primary_channels 16 --num_primary_layers 2 --num_secondary_channels 32 --num_secondary_layers 2 \
    --num_tertiary_channels 64 --num_tertiary_layers 2 --num_quaternary_channels 128 --num_quaternary_layers 2 \
    --train_images_path $CACHE/train_8x --test_images_path $CACHE/eval_8x \
    --loss_combiner pixel --num_epochs 12 --early_stop_patience 4 \
    --upscaler_learning_rate 2e-4 --lr_schedule cosine --cosine_epochs 10 \
    --activation_checkpointing \
    --checkpoint_path $CKPT/r4_x8_tiny --run_dir_path runs/r4_x8_tiny \
    --seed 420 ;;

*) echo "unknown stage: $1" >&2; exit 2 ;;
esac
