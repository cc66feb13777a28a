#!/usr/bin/env bash
# Round-4 post-queue packaging chain (runs after tools/queue_r4g.sh).
#
# Sessions restart frequently, so the ship-or-keep decisions that follow
# the experiment queue are automated here with explicit numeric gates:
#
#   1. Flagship: if the r4 polish beats the round-3 shipped flagship
#      (PSNR 23.842 on pairs_r3_2x) re-package artifacts/mewzoom-tpu-2x-unet
#      from checkpoints/r4_unet_polish (bfloat16 + gated ONNX), re-eval the
#      packaged artifact, and commit.  Otherwise keep the r3 artifact.
#   2. GAN sweep winner: among the r4_gan* evals, pick the best-VIF
#      candidate whose PSNR also beats the round-3 shipped GAN artifact
#      (24.641); if found, re-package artifacts/mewzoom-tpu-2x-ctrl-gan,
#      re-eval, commit.  The "earns its keep vs the polish base
#      (24.864/0.6444/0.4737)" narrative is written by hand afterwards.
#
#   bash tools/queue_r4h.sh    (log: /tmp/queue_r4h.log)
set -uo pipefail
cd "$(dirname "$0")/.."

log() { echo "$(date -u +%T) $*"; }

commit_paths() { # msg path...  (same contract as queue_r4g.sh)
  local msg=$1; shift
  local existing=()
  for p in "$@"; do [ -e "$p" ] && existing+=("$p"); done
  [ ${#existing[@]} -gt 0 ] || { log "commit: nothing exists ($msg)"; return 0; }
  git add -f -- "${existing[@]}"
  git reset -q -- '*.tmp' 2>/dev/null || true
  if git diff --cached --quiet -- "${existing[@]}"; then log "commit: no changes ($msg)"; return 0; fi
  git commit -q -m "$msg" -- "${existing[@]}" && log "committed: $msg"
}

# ---- 0. wait for the experiment queue to finish.
QUEUE_PID_FILE="${QUEUE_PID_FILE:-/tmp/queue_r4g.pid}"
if [ -f "$QUEUE_PID_FILE" ]; then
  qpid=$(cat "$QUEUE_PID_FILE")
  while kill -0 "$qpid" 2>/dev/null; do
    log "waiting for queue_r4g (pid $qpid): $(tail -1 /tmp/queue_r4g.log 2>/dev/null)"
    sleep 180
  done
fi
log "queue_r4g done; packaging gates"

# eval line format: "  model:   PSNR 23.140  SSIM 0.5439  VIF 0.4265"
field() { awk -v f="$2" '/^  model:/{print $f; exit}' "$1" 2>/dev/null; }
psnr_of() { field "$1" 3; }
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

# ---- 1. flagship gate.
FP=$(psnr_of docs/eval_r4/r4_unet_polish.txt)
log "flagship polish pairs PSNR: ${FP:-absent} (r3 shipped: 23.842, +0.5dB bar: 24.243)"
if [ -n "${FP:-}" ] && gt "$FP" 23.842; then
  if bash tools/package_r3.sh r4_unet_polish mewzoom-tpu-2x-unet bfloat16 \
       > /tmp/stage_package_unet.log 2>&1; then
    # Round-3 policy: the 56M flagship's ~225 MB ONNX is gated during
    # packaging but NOT committed (README documents regeneration via
    # tools.export_onnx); dropping it here keeps the artifact at 108 MB.
    rm -f artifacts/mewzoom-tpu-2x-unet/model.onnx
    eval_artifact mewzoom-tpu-2x-unet 2
    commit_paths "artifacts: round-4 2X U-Net flagship (full-anneal s1 + pixel_ssim polish)" \
      artifacts/mewzoom-tpu-2x-unet docs/eval_r4/artifact_mewzoom-tpu-2x-unet.txt
  else
    log "flagship packaging FAILED (see /tmp/stage_package_unet.log)"
  fi
else
  log "flagship gate NOT met; keeping round-3 artifact"
fi

# ---- 2. GAN sweep winner gate.
best=""; best_vif=0.4584   # must beat the r3 shipped GAN artifact's VIF
for g in A B C D E; do
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
  log "no GAN candidate beats the r3 shipped artifact; keeping it"
fi

log "queue r4h complete"
