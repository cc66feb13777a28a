#!/usr/bin/env bash
# Round-4 restart queue: the VM rebooted mid-queue-I, wiping the
# .gitignored cache_r3/ sample caches and the derived r4_2x_base
# checkpoint.  Everything rebuilds deterministically (same seeds), so
# resumed training continues on identical data:
#   1. rebuild cache_r3/{train,eval}_{2,3}x
#   2. rebuild checkpoints/r4_2x_base from the committed 2X Ctrl artifact
#   3. evaluate the already-trained ganD arm (queue G died before this)
#   4. hand off to queue_r4i.sh (ganE, ganF, gates, TTA, bench, 3X)
#
#   bash tools/queue_r4j.sh [skip_stage ...]   (stages: cache2x cache3x
#                                               gan_base evalD + queue-I's)
set -uo pipefail
cd "$(dirname "$0")/.."

SKIP=" $* "
skip() { case "$SKIP" in *" $1 "*) return 0;; *) return 1;; esac }
log() { echo "$(date -u +%T) $*"; }

retry() { # name cmd...
  local name=$1; shift
  if skip "$name"; then log "stage $name skipped"; return 0; fi
  for attempt in 1 2 3; do
    log "=== stage $name (attempt $attempt) ==="
    if "$@" > "/tmp/stage_$name.log" 2>&1; then log "stage $name OK"; return 0; fi
    log "stage $name FAILED (see /tmp/stage_$name.log)"
  done
  return 1
}

DS=dataset_r3
CACHE=cache_r3
DEG="--min_gaussian_blur 0.0 --max_gaussian_blur 1.0 \
     --min_gaussian_noise 0.0 --max_gaussian_noise 0.1 \
     --min_compression 0.0 --max_compression 0.8"

cache2x() {
  python -m ultrazoom_tpu.tools.cache_dataset --images_path $DS/train \
    --out $CACHE/train_2x --upscale_ratio 2 --num_variants 8 \
    --target_resolution 256 $DEG --seed 300
  python -m ultrazoom_tpu.tools.cache_dataset --images_path $DS/test \
    --out $CACHE/eval_2x --upscale_ratio 2 --num_variants 1 \
    --target_resolution 256 $DEG --eval --seed 301
}
cache3x() {
  python -m ultrazoom_tpu.tools.cache_dataset --images_path $DS/train \
    --out $CACHE/train_3x --upscale_ratio 3 --num_variants 8 \
    --target_resolution 252 $DEG --seed 300
  python -m ultrazoom_tpu.tools.cache_dataset --images_path $DS/test \
    --out $CACHE/eval_3x --upscale_ratio 3 --num_variants 1 \
    --target_resolution 252 $DEG --eval --seed 301
}

[ -d $CACHE/train_2x ] || { retry cache2x cache2x || exit 1; }
[ -d $CACHE/train_3x ] || { retry cache3x cache3x || exit 1; }
[ -d checkpoints/r4_2x_base ] || {
  retry gan_base bash tools/recipes_r4.sh gan_base || exit 1
}

# ---- ganD evaluation (trained + committed by queue G; never evaluated).
skip evalD || {
  mkdir -p docs/eval_r4
  for ck in r4_ganD r4_ganD_best; do
    [ -f "docs/eval_r4/$ck.txt" ] && continue
    bash tools/eval_r4.sh "$ck" 2 > "docs/eval_r4/$ck.txt" 2>&1
    git add -f "docs/eval_r4/$ck.txt"
    git commit -q -m "eval: $ck vs pairs_r3_2x" -- "docs/eval_r4/$ck.txt" \
      && log "committed eval $ck"
  done
}

exec bash tools/queue_r4i.sh "$@"
