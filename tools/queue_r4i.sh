#!/usr/bin/env bash
# Round-4 closing queue (runs after the GAN sweep A-D in queue_r4g.sh).
#
# Stages (skip by name, same contract as queue_r4g.sh):
#   ganE + evals        - the sweep's designed-from-A-D arm
#   gan_gate            - package the sweep winner IFF it beats BOTH the
#                         round-3 shipped GAN artifact (PSNR 24.641) AND
#                         the polish base's VIF (0.4737) - i.e. the stage
#                         must actually buy perceptual quality over its
#                         own starting point, not just beat last round

#   cache4x             - background 4X sample-cache rebuild (host side)
#   r4_4x_s1/r4_4x_polish - corrected-anneal 4X retrain (cosine horizon
#                         inside the epoch budget; the shipped 4X s1
#                         early-stopped mid-anneal at ~0.41x peak lr)
#   x4_gate             - package 4X IFF all three metrics beat the
#                         SHIPPED round-3 artifact (23.089/0.5619/0.3815)
#   tta                 - self-ensemble rows for the README table
#   bench_suite / bench - perf refresh (incl. compute-only rows)
#
#   bash tools/queue_r4i.sh [skip_stage ...]   (logs: /tmp/stage_*.log)
set -uo pipefail
cd "$(dirname "$0")/.."

SKIP=" $* "
skip() { case "$SKIP" in *" $1 "*) return 0;; *) return 1;; esac }
log() { echo "$(date -u +%T) $*"; }

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

snapshot_run() { # name cmd...   (rolling committed snapshot every 45 min)
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

eval_into() { # ckpt ratio -> docs/eval_r4/<ckpt>.txt (committed)
  mkdir -p docs/eval_r4
  bash tools/eval_r4.sh "$1" "$2" > "docs/eval_r4/$1.txt" 2>&1
  commit_paths "eval: $1 vs pairs_r3_$2x" "docs/eval_r4/$1.txt"
}

# eval line format: "  model:   PSNR 23.140  SSIM 0.5439  VIF 0.4265"
field() { awk -v f="$2" '/^  model:/{print $f; exit}' "$1" 2>/dev/null; }
psnr_of() { field "$1" 3; }
ssim_of() { field "$1" 5; }
vif_of()  { field "$1" 7; }
gt() { awk -v a="${1:-0}" -v b="$2" 'BEGIN{exit !(a+0 > b+0)}'; }

CV="--gaussian_blur 0.5 --gaussian_noise 0.05 --jpeg_compression 0.4"
eval_artifact() { # name ratio -> docs/eval_r4/artifact_<name>.txt
  mkdir -p docs/eval_r4
  { echo "== artifacts/$1 (pairs_r3_$2x) =="
    python -m ultrazoom_tpu.tools.validate --model_path "artifacts/$1" \
      --lr_images_path "pairs_r3_$2x/lr" --hr_images_path "pairs_r3_$2x/hr" \
      $CV 2>/dev/null | grep -v WARNING
  } > "docs/eval_r4/artifact_$1.txt" 2>&1
  cat "docs/eval_r4/artifact_$1.txt"
}

# ---- 0. 4X sample-cache rebuild, in the background: the GAN arms hold
#         the chip but run device-resident, so the 1-CPU host core is
#         free to regenerate the reboot-wiped cache for stage 3.
DEG="--min_gaussian_blur 0.0 --max_gaussian_blur 1.0 \
     --min_gaussian_noise 0.0 --max_gaussian_noise 0.1 \
     --min_compression 0.0 --max_compression 0.8"
cache4x() {
  python -m ultrazoom_tpu.tools.cache_dataset --images_path dataset_r3/train \
    --out cache_r3/train_4x --upscale_ratio 4 --num_variants 8 \
    --target_resolution 256 $DEG --seed 300
  python -m ultrazoom_tpu.tools.cache_dataset --images_path dataset_r3/test \
    --out cache_r3/eval_4x --upscale_ratio 4 --num_variants 1 \
    --target_resolution 256 $DEG --eval --seed 301
}
rmdir cache_r3/train_3x cache_r3/eval_3x 2>/dev/null || true  # queue-J placeholders
rm -f /tmp/cache4x.rc
if skip cache4x || [ -d cache_r3/train_4x ]; then
  echo 0 > /tmp/cache4x.rc
else
  log "cache4x: rebuilding in the background"
  ( cache4x > /tmp/stage_cache4x.log 2>&1; echo $? > /tmp/cache4x.rc ) &
fi

# ---- 1. ganE (recipe designed from the A-D results; recipes_r4.sh ganE).
retry ganE bash tools/recipes_r4.sh ganE
skip commit_ganE || {
  commit_paths "r4 experiment: GAN sweep E checkpoint + run log" \
    checkpoints/r4_ganE checkpoints/r4_ganE_best runs/r4_ganE
  eval_into r4_ganE 2
  eval_into r4_ganE_best 2
}

# ---- 1b. ganF (stride-halved control of A; recipes_r4.sh ganF).
retry ganF bash tools/recipes_r4.sh ganF
skip commit_ganF || {
  commit_paths "r4 experiment: GAN sweep F checkpoint + run log" \
    checkpoints/r4_ganF checkpoints/r4_ganF_best runs/r4_ganF
  eval_into r4_ganF 2
  eval_into r4_ganF_best 2
}

# ---- 2. GAN winner gate: best VIF among candidates with
#         PSNR > r3-shipped-GAN (24.641) AND VIF > polish base (0.4737).
skip gan_gate || {
  best=""; best_vif=0.4737
  for g in A B C D E F; do
    for ck in "r4_gan${g}_best" "r4_gan$g"; do
      f="docs/eval_r4/$ck.txt"
      [ -f "$f" ] || continue
      p=$(psnr_of "$f"); v=$(vif_of "$f")
      [ -n "${p:-}" ] && [ -n "${v:-}" ] || continue
      log "GAN candidate $ck: PSNR $p VIF $v"
      if gt "$p" 24.641 && gt "$v" "$best_vif"; then best="$ck"; best_vif="$v"; fi
    done
  done
  if [ -n "$best" ]; then
    log "GAN winner: $best (VIF $best_vif)"
    if bash tools/package_r3.sh "$best" mewzoom-tpu-2x-ctrl-gan \
         > /tmp/stage_package_gan.log 2>&1; then
      eval_artifact mewzoom-tpu-2x-ctrl-gan 2
      commit_paths "artifacts: round-4 2X Ctrl GAN ($best wins the sweep)" \
        artifacts/mewzoom-tpu-2x-ctrl-gan docs/eval_r4/artifact_mewzoom-tpu-2x-ctrl-gan.txt
    else
      log "GAN packaging FAILED (see /tmp/stage_package_gan.log)"
    fi
  else
    log "no GAN candidate beats BOTH bars; keeping the r3 artifact"
  fi
}

# ---- 3. corrected-anneal 4X retrain (recipes_r4.sh x4_s1/x4_polish).
#         Replaces the previously-planned 3X rerun: the round-3 3X
#         negative result was already closed inside round 3 (commit
#         ccc074e re-shipped 3X at 23.874/0.5912/0.3962), while the
#         shipped 4X s1 still carries the mid-anneal truncation (stopped
#         epoch 56 of a 100-epoch cosine, ~0.41x peak lr).  Runs BEFORE
#         the TTA/bench rows: if the session dies mid-queue, a shippable
#         4X artifact beats refreshed perf rows.  An s1 failure skips
#         the rest of the 4X chain but NOT sections 5/6.
skip r4_4x_s1 || {
  while [ ! -f /tmp/cache4x.rc ]; do sleep 30; done
  if [ "$(cat /tmp/cache4x.rc)" != 0 ]; then
    log "background cache4x failed; one synchronous retry"
    rm -rf cache_r3/train_4x cache_r3/eval_4x
    retry cache4x cache4x || SKIP="$SKIP r4_4x_s1 r4_4x_polish x4_gate "
  fi
}
if snapshot_run r4_4x_s1 bash tools/recipes_r4.sh x4_s1; then
  skip eval_4x_s1 || eval_into r4_4x_s1 4
  snapshot_run r4_4x_polish bash tools/recipes_r4.sh x4_polish \
    || log "x4_polish failed after retries; evaluating its last checkpoint anyway"
  skip eval_4x_polish || eval_into r4_4x_polish 4
else
  log "x4_s1 failed/skipped; skipping the 4X chain"
  SKIP="$SKIP x4_gate "
fi

# ---- 4. 4X packaging gate: every metric must beat the SHIPPED round-3
#         artifact (pairs_r3_4x: 23.089 / 0.5619 / 0.3815) — the bar is
#         the current artifact, so a regression can never re-ship.
skip x4_gate || {
  bestck=""
  bp=0; bs=0; bv=0
  for ck in r4_4x_polish r4_4x_s1; do
    f="docs/eval_r4/$ck.txt"
    [ -f "$f" ] || continue
    p=$(psnr_of "$f"); s=$(ssim_of "$f"); v=$(vif_of "$f")
    [ -n "${p:-}" ] || continue
    log "4X candidate $ck: PSNR $p SSIM $s VIF $v"
    if gt "$p" 23.089 && gt "$s" 0.5619 && gt "$v" 0.3815 && gt "$p" "$bp"; then
      bestck="$ck"; bp=$p; bs=$s; bv=$v
    fi
  done
  if [ -n "$bestck" ]; then
    log "4X winner: $bestck ($bp / $bs / $bv)"
    if bash tools/package_r3.sh "$bestck" mewzoom-tpu-4x-ctrl \
         > /tmp/stage_package_4x.log 2>&1; then
      eval_artifact mewzoom-tpu-4x-ctrl 4
      commit_paths "artifacts: round-4 4X Ctrl (completed anneal beats the round-3 training)" \
        artifacts/mewzoom-tpu-4x-ctrl docs/eval_r4/artifact_mewzoom-tpu-4x-ctrl.txt
    else
      log "4X packaging FAILED (see /tmp/stage_package_4x.log)"
    fi
  else
    log "4X retrain does not beat the shipped artifact on all metrics; keeping it"
  fi
}

# ---- 5. TTA (self-ensemble) rows.
skip tta || {
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

# ---- 6. perf refresh.
skip bench_suite || {
  timeout 3600 python -m ultrazoom_tpu.tools.bench_suite \
    > docs/eval_r4/bench_suite.txt 2>&1 || log "bench_suite FAILED/timed out"
  commit_paths "bench: round-4 suite refresh" docs/eval_r4/bench_suite.txt
}
skip bench || python bench.py > /tmp/bench_r4.log 2>&1 || log "bench.py FAILED"

log "queue r4i complete"
