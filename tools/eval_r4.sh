#!/usr/bin/env bash
# Round-4 quality evaluation: round-4 stage checkpoints vs the SAME
# fixed-degradation held-out pairs as round 3 (blur .5, noise .05,
# jpeg .4; regenerate with
#   python -m ultrazoom_tpu.tools.make_demo_dataset --out pairs_r3_2x \
#     --pairs_from dataset_r3/test --ratio 2 --blur 0.5 --noise 0.05 --jpeg 0.4
# — deterministic, so the README round-3 bicubic baselines stay
# comparable).
#
#   bash tools/eval_r4.sh              # evaluate every r4 checkpoint present
#   bash tools/eval_r4.sh r4_ganB 2    # one checkpoint at one ratio
set -uo pipefail
cd "$(dirname "$0")/.."

CV="--gaussian_blur 0.5 --gaussian_noise 0.05 --jpeg_compression 0.4"

eval_one() { # ckpt ratio
  local ck=$1 r=$2
  [ -f "checkpoints/$ck/meta.json" ] || { echo "-- $ck: absent, skipped"; return; }
  echo "== $ck (pairs_r3_${r}x) =="
  python -m ultrazoom_tpu.tools.validate --model_path "checkpoints/$ck" \
    --lr_images_path "pairs_r3_${r}x/lr" --hr_images_path "pairs_r3_${r}x/hr" \
    $CV 2>/dev/null | grep -v WARNING
}

if [ $# -ge 2 ]; then
  eval_one "$1" "$2"
  exit 0
fi

for st in s1 polish; do eval_one "r4_unet_$st" 2; done
for g in A B C D E; do
  eval_one "r4_gan$g" 2
  eval_one "r4_gan${g}_best" 2   # --best_checkpoint_metric snapshots
done
