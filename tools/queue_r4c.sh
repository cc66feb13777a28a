#!/usr/bin/env bash
# Round-4 chained queue C: waits for tools/queue_r4b.sh, then
#   1. unet_ps_scratch — recipe A/B for the 56M flagship (VERDICT r3 #2):
#      train pixel_ssim from scratch with a full cosine anneal.  Motive:
#      the balanced (random-VGG) stage 1 lands 0.4 dB BELOW bicubic on
#      cache-eval (best 19.705 vs 20.098) and the polish spends its whole
#      budget recovering; the full-budget two-stage run (s1 44 ep + polish
#      30 ep) reached cache-eval 20.531 — barely above round 3's 20.52 —
#      so the two-stage recipe looks saturated.  If direct distortion
#      training wins, ship it and record the recipe finding; if it loses,
#      that's the definitive defence of the reference's two-stage recipe.
#   2. TTA evals — the x8 self-ensemble rows for the README quality table
#      (flagship + shipped 2X/4X Ctrl artifacts on the held-out pairs).
#
#   bash tools/queue_r4c.sh   (logs: /tmp/train_ps_scratch.log, /tmp/eval_r4_tta.log)
set -uo pipefail
cd "$(dirname "$0")/.."

if [ -f /tmp/queue_r4b.pid ]; then
  qpid=$(cat /tmp/queue_r4b.pid)
  while kill -0 "$qpid" 2>/dev/null; do
    echo "$(date -u +%T) waiting for queue_r4b (pid $qpid)"
    sleep 60
  done
fi
echo "$(date -u +%T) queue_r4b done; starting stages"

for attempt in 1 2 3 4; do
  echo "$(date -u +%T) === unet_ps_scratch (attempt $attempt) ==="
  if python -m ultrazoom_tpu.train.pretrain --auto_resume --device_data_budget_gib 8 \
      --arch unet --upscale_ratio 2 \
      --train_images_path cache_r3/train_2x --test_images_path cache_r3/eval_2x \
      --loss_combiner pixel_ssim --num_epochs 56 --early_stop_patience 6 \
      --upscaler_learning_rate 1e-4 --lr_schedule cosine --cosine_epochs 48 \
      --activation_checkpointing \
      --checkpoint_path checkpoints/r4_unet_ps_scratch --run_dir_path runs/r4_unet_ps_scratch \
      --seed 440 > /tmp/train_ps_scratch.log 2>&1; then
    echo "$(date -u +%T) unet_ps_scratch OK"; break
  fi
  echo "$(date -u +%T) unet_ps_scratch FAILED (see /tmp/train_ps_scratch.log)"
done

{
  bash tools/eval_r4.sh r4_unet_ps_scratch 2
  CV="--gaussian_blur 0.5 --gaussian_noise 0.05 --jpeg_compression 0.4"
  for target in checkpoints/r4_unet_polish2 checkpoints/r4_unet_ps_scratch \
                artifacts/mewzoom-tpu-2x-ctrl artifacts/mewzoom-tpu-4x-ctrl; do
    [ -d "$target" ] || { echo "-- $target absent, skipped"; continue; }
    r=2; case "$target" in *4x*) r=4;; esac
    echo "== $target + self-ensemble (pairs_r3_${r}x) =="
    python -m ultrazoom_tpu.tools.validate --model_path "$target" \
      --lr_images_path "pairs_r3_${r}x/lr" --hr_images_path "pairs_r3_${r}x/hr" \
      $CV --self_ensemble 2>/dev/null | grep -v WARNING
  done
} > /tmp/eval_r4_tta.log 2>&1
echo "$(date -u +%T) queue C complete"
