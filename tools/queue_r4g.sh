#!/usr/bin/env bash
# Round-4 DURABLE recovery queue (successor to tools/queue_r4f.sh).
#
# Two VM wipes have now destroyed uncommitted training state mid-queue
# (dataset_r3, cache_r3, checkpoints/, runs/ are .gitignored by design).
# This version makes every landed result durable by committing it:
#
#   - dataset_r3 (force-add, ~1.1 GiB, one-time) as soon as it exists —
#     regeneration costs ~45 min of the single host CPU
#   - the held-out eval pairs (small) once built
#   - each finished stage's checkpoint (state.npz + meta.json), run log,
#     and eval output (docs/eval_r4/*.txt)
#   - a rolling mid-train snapshot of the flagship run every ~45 min,
#     so --auto_resume continues from the last committed epoch after a
#     wipe instead of from scratch
#
# Caches (cache_r3, ~6 GiB) stay uncommitted: they rebuild in ~40 min
# from the committed dataset, bit-identically (fixed seeds).
#
# Stage order = headline item first (its snapshots make it resumable
# across sessions, so starting it early maximises committed progress):
#   1. caches + pairs                  (CPU)
#   2. 56M flagship two-stage          (VERDICT r3 #2 — the judge's
#      prescribed recipe: balanced s1 full cosine anneal + pixel_ssim
#      polish; NOT queue_r4f's untested ps_scratch shortcut.  Timing:
#      ~113 s/epoch at the measured 13.9 HR MP/s -> s1 ~1.9 h,
#      polish ~1 h)
#   3. x8 tiny end-to-end              (VERDICT r3 #7, ~15 min)
#   4. GAN sweep base + A..E           (VERDICT r3 #5; 5 x ~20 min,
#      eval + commit after every run)
#   5. TTA rows + bench refresh
#
#   bash tools/queue_r4g.sh [skip_stage ...]     (logs: /tmp/stage_*.log)
set -uo pipefail
cd "$(dirname "$0")/.."

SKIP=" $* "
skip() { case "$SKIP" in *" $1 "*) return 0;; *) return 1;; esac }
log() { echo "$(date -u +%T) $*"; }

# Commit exactly the named paths (force-add past .gitignore, drop any
# in-flight atomic-write temps); never sweeps unrelated staged work.
commit_paths() { # msg path...
  local msg=$1; shift
  local existing=()
  for p in "$@"; do [ -e "$p" ] && existing+=("$p"); done
  [ ${#existing[@]} -gt 0 ] || { log "commit: nothing exists ($msg)"; return 0; }
  git add -f -- "${existing[@]}"
  git reset -q -- '*.tmp' 2>/dev/null || true
  if git diff --cached --quiet -- "${existing[@]}"; then log "commit: no changes ($msg)"; return 0; fi
  git commit -q -m "$msg" -- "${existing[@]}" && log "committed: $msg"
}

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

eval_into() { # ckpt ratio -> docs/eval_r4/<ckpt>.txt (committed)
  mkdir -p docs/eval_r4
  bash tools/eval_r4.sh "$1" "$2" > "docs/eval_r4/$1.txt" 2>&1
  commit_paths "eval: $1 vs pairs_r3_$2x" "docs/eval_r4/$1.txt"
}

# ---- 0. dataset: wait for a live generator, else regenerate; commit.
if [ -f /tmp/make_dataset.pid ]; then
  dpid=$(cat /tmp/make_dataset.pid)
  while kill -0 "$dpid" 2>/dev/null; do
    log "waiting for dataset generator (pid $dpid, $(ls dataset_r3/train 2>/dev/null | wc -l) train images)"
    sleep 60
  done
fi
if [ ! -d dataset_r3/test ]; then
  retry dataset python -m ultrazoom_tpu.tools.make_demo_dataset \
    --out dataset_r3 --n_train 3000 --n_test 60 --seed 300 || exit 1
fi
log "dataset ready: $(ls dataset_r3/train | wc -l) train / $(ls dataset_r3/test | wc -l) test"
skip commit_dataset || commit_paths \
  "data: commit the deterministic round-3/4 corpus (two wipes is enough)" dataset_r3

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
pairs() {
  for r in 2 3 4 8; do
    [ -d pairs_r3_${r}x/hr ] || \
      python -m ultrazoom_tpu.tools.make_demo_dataset --out pairs_r3_${r}x \
        --pairs_from $DS/test --ratio $r --blur 0.5 --noise 0.05 --jpeg 0.4
  done
}
[ -d $CACHE/train_2x ] || { retry cache2x cache2x || exit 1; }
retry pairs pairs || exit 1
skip commit_pairs || commit_paths "data: held-out fixed-degradation eval pairs (x2/3/4/8)" pairs_r3_2x pairs_r3_3x pairs_r3_4x pairs_r3_8x

# Run a long training stage in the background with a rolling committed
# snapshot every 45 min, so --auto_resume continues from the last
# committed epoch after a wipe instead of from scratch.
#
# Retries up to 3 attempts: the stages passed here all use
# --auto_resume, so a watchdog exit (rc=43, wedged tunnel RPC — observed
# live at s1 epoch 14) or crash relaunches from the last complete
# checkpoint instead of silently cascading into dependent stages.
snapshot_run() { # name cmd...
  local name=$1; shift
  if skip "$name"; then log "stage $name skipped"; return 0; fi
  local rc=1
  for attempt in 1 2 3; do
    log "=== stage $name (snapshot-committed, attempt $attempt) ==="
    "$@" > "/tmp/stage_$name.log" 2>&1 &
    local pid=$!
    echo "$pid" > "/tmp/$name.pid"
    while kill -0 "$pid" 2>/dev/null; do
      sleep 2700
      kill -0 "$pid" 2>/dev/null || break
      commit_paths "r4 experiment: $name rolling snapshot" \
        "checkpoints/$name" "runs/$name"
    done
    wait "$pid"; rc=$?
    log "$name attempt $attempt exited rc=$rc"
    commit_paths "r4 experiment: $name state (attempt $attempt, rc=$rc)" \
      "checkpoints/$name" "runs/$name"
    [ "$rc" -eq 0 ] && break
  done
  return "$rc"
}

# ---- 1. flagship two-stage: balanced s1 full cosine anneal, then
#         pixel_ssim polish (the round-3-proven recipe at full budget).
snapshot_run r4_unet_s1 bash tools/recipes_r4.sh unet_s1 || exit 1
skip eval_s1 || eval_into r4_unet_s1 2
snapshot_run r4_unet_polish bash tools/recipes_r4.sh unet_polish \
  || log "polish failed after retries; evaluating its last checkpoint anyway"
skip eval_polish || eval_into r4_unet_polish 2

# ---- 2. x8 tiny end-to-end.
retry x8_cache bash tools/recipes_r4.sh x8_cache
retry x8_tiny bash tools/recipes_r4.sh x8_tiny
skip commit_x8 || {
  commit_paths "r4 experiment: x8 tiny end-to-end checkpoint" \
    checkpoints/r4_x8_tiny runs/r4_x8_tiny
  eval_into r4_x8_tiny 8
}

# ---- 3. GAN sweep (short runs, eval + commit after each).
retry gan_base bash tools/recipes_r4.sh gan_base
for g in A B C D E; do
  retry gan$g bash tools/recipes_r4.sh gan$g
  skip commit_gan$g || {
    commit_paths "r4 experiment: GAN sweep $g checkpoint + run log" \
      checkpoints/r4_gan$g checkpoints/r4_gan${g}_best runs/r4_gan$g
    eval_into "r4_gan$g" 2
    eval_into "r4_gan${g}_best" 2
  }
done

# ---- 4. TTA (self-ensemble) rows for the README quality table.
skip tta || {
  CV="--gaussian_blur 0.5 --gaussian_noise 0.05 --jpeg_compression 0.4"
  mkdir -p docs/eval_r4
  for target in checkpoints/r4_unet_polish \
                artifacts/mewzoom-tpu-2x-ctrl artifacts/mewzoom-tpu-4x-ctrl; do
    [ -d "$target" ] || { echo "-- $target absent, skipped"; continue; }
    r=2; case "$target" in *4x*) r=4;; esac
    echo "== $target + self-ensemble (pairs_r3_${r}x) =="
    python -m ultrazoom_tpu.tools.validate --model_path "$target" \
      --lr_images_path "pairs_r3_${r}x/lr" --hr_images_path "pairs_r3_${r}x/hr" \
      $CV --self_ensemble 2>/dev/null | grep -v WARNING
  done > docs/eval_r4/tta.txt 2>&1
  commit_paths "eval: self-ensemble (TTA) rows" docs/eval_r4/tta.txt
}

# ---- 5. perf refresh.
skip bench_suite || {
  timeout 3600 python -m ultrazoom_tpu.tools.bench_suite \
    > docs/eval_r4/bench_suite.txt 2>&1 || log "bench_suite FAILED/timed out"
  commit_paths "bench: round-4 suite refresh" docs/eval_r4/bench_suite.txt
}
skip bench || python bench.py > /tmp/bench_r4.log 2>&1 || log "bench.py FAILED"

log "queue r4g complete"
