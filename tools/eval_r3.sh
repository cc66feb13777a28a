#!/usr/bin/env bash
# Round-3 quality evaluation: every finished stage checkpoint vs the
# fixed-degradation held-out pairs (blur .5, noise .05, jpeg .4 — the
# same control vector the pairs were built with).  Prints one block per
# checkpoint; the README table ships the best stage per family
# ("ship-best-stage" rule, README round-2 notes).
#
#   bash tools/eval_r3.sh             # evaluate everything present
#   bash tools/eval_r3.sh r3_4x_gan 4 # one checkpoint at one ratio
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

for st in s1 polish gan; do eval_one "r3_4x_$st" 4; done
for st in s1 polish gan; do eval_one "r3_3x_$st" 3; done
for st in s1 polish gan; do eval_one "r3_2x_$st" 2; done
for st in s1 polish;     do eval_one "r3_unet_$st" 2; done
