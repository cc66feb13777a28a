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

#   bench_suite / bench - perf refresh (incl. compute-only rows)
#   x3_s1 / x3_polish   - corrected 3X retrain (cosine inside budget;
#                         closes the round-3 negative result)
#   x3_gate             - package 3X IFF all three metrics beat the
#                         shipped round-2 artifact (23.590/0.5788/0.3937)
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

# ---- 3. corrected 3X retrain (recipes_r4.sh x3_s1/x3_polish).  Runs
#         BEFORE the TTA/bench rows: if the session dies mid-queue, a
#         shippable 3X artifact beats refreshed perf rows.  An s1
#         failure skips the rest of the 3X chain but NOT sections 5/6.
if snapshot_run r4_3x_s1 bash tools/recipes_r4.sh x3_s1; then
  skip eval_3x_s1 || eval_into r4_3x_s1 3
  snapshot_run r4_3x_polish bash tools/recipes_r4.sh x3_polish \
    || log "x3_polish failed after retries; evaluating its last checkpoint anyway"
  skip eval_3x_polish || eval_into r4_3x_polish 3
else
  log "x3_s1 failed after retries; skipping the 3X chain"
  SKIP="$SKIP x3_gate "
fi

# ---- 4. 3X packaging gate: every metric must beat the shipped round-2
#         artifact (pairs_r3_3x: 23.590 / 0.5788 / 0.3937).
skip x3_gate || {
  bestck=""
  bp=0; bs=0; bv=0
  for ck in r4_3x_polish r4_3x_s1; do
    f="docs/eval_r4/$ck.txt"
    [ -f "$f" ] || continue
    p=$(psnr_of "$f"); s=$(ssim_of "$f"); v=$(vif_of "$f")
    [ -n "${p:-}" ] || continue
    log "3X candidate $ck: PSNR $p SSIM $s VIF $v"
    if gt "$p" 23.590 && gt "$s" 0.5788 && gt "$v" 0.3937 && gt "$p" "$bp"; then
      bestck="$ck"; bp=$p; bs=$s; bv=$v
    fi
  done
  if [ -n "$bestck" ]; then
    log "3X winner: $bestck ($bp / $bs / $bv)"
    if bash tools/package_r3.sh "$bestck" mewzoom-tpu-3x-ctrl \
         > /tmp/stage_package_3x.log 2>&1; then
      eval_artifact mewzoom-tpu-3x-ctrl 3
      commit_paths "artifacts: round-4 3X Ctrl (corrected anneal beats the round-2 training)" \
        artifacts/mewzoom-tpu-3x-ctrl docs/eval_r4/artifact_mewzoom-tpu-3x-ctrl.txt
    else
      log "3X packaging FAILED (see /tmp/stage_package_3x.log)"
    fi
  else
    log "3X retrain does not beat the round-2 artifact on all metrics; keeping it"
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
