#!/usr/bin/env bash
# Round-4 follow-up queue: waits for the primary queue (tools/queue_r4.sh,
# pid in /tmp/queue_r4.pid) to release the chip, then
#   1. polish2 — continues the flagship pixel_ssim polish, which hit its
#      30-epoch cap while eval PSNR/SSIM were still improving
#      (20.498 -> 20.521 -> 20.530 -> 20.531 over the last 6 epochs).
#      Cosine-annealed continuation squeezes out the remaining headroom
#      toward the >= +0.5 dB-over-bicubic ship gate (VERDICT r3 #2).
#   2. eval — every round-4 checkpoint on the SAME held-out
#      fixed-degradation pairs as round 3 (tools/eval_r4.sh), so the
#      README tables stay comparable.
#
#   bash tools/queue_r4b.sh   (logs: /tmp/train_polish2.log, /tmp/eval_r4.log)
set -uo pipefail
cd "$(dirname "$0")/.."

if [ -f /tmp/queue_r4.pid ]; then
  qpid=$(cat /tmp/queue_r4.pid)
  while kill -0 "$qpid" 2>/dev/null; do
    echo "$(date -u +%T) waiting for primary queue (pid $qpid)"
    sleep 60
  done
fi
echo "$(date -u +%T) primary queue done; starting follow-up stages"

for attempt in 1 2 3 4; do
  echo "$(date -u +%T) === polish2 (attempt $attempt) ==="
  if python -m ultrazoom_tpu.train.pretrain --auto_resume --device_data_budget_gib 8 \
      --arch unet --upscale_ratio 2 \
      --train_images_path cache_r3/train_2x --test_images_path cache_r3/eval_2x \
      --loss_combiner pixel_ssim --num_epochs 24 --early_stop_patience 5 \
      --upscaler_learning_rate 5e-5 --lr_schedule cosine --cosine_epochs 22 \
      --activation_checkpointing --init_params_from checkpoints/r4_unet_polish \
      --checkpoint_path checkpoints/r4_unet_polish2 --run_dir_path runs/r4_unet_polish2 \
      --seed 430 > /tmp/train_polish2.log 2>&1; then
    echo "$(date -u +%T) polish2 OK"; break
  fi
  echo "$(date -u +%T) polish2 FAILED (see /tmp/train_polish2.log)"
done

{
  bash tools/eval_r4.sh
  bash tools/eval_r4.sh r4_unet_polish2 2
  bash tools/eval_r4.sh r4_x8_tiny 8
} > /tmp/eval_r4.log 2>&1
echo "$(date -u +%T) follow-up queue complete"
