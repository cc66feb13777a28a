#!/usr/bin/env bash
# Round-3 sequential training queue (one v5e chip).  Started while the
# 4x_s1 stage is already running: waits for that PID (arg 1, optional),
# then drives the remaining recipe stages, gating the 2X/unet families
# on their cache build finishing.  Logs per stage under /tmp/.
set -uo pipefail
cd "$(dirname "$0")/.."

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "$(date -u +%T) waiting for running stage (pid $WAIT_PID)..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

run() { # stage
  echo "$(date -u +%T) === stage $1 ==="
  if bash tools/recipes_r3.sh "$1" > "/tmp/train_$1.log" 2>&1; then
    echo "$(date -u +%T) stage $1 OK"
  else
    echo "$(date -u +%T) stage $1 FAILED (see /tmp/train_$1.log)"
  fi
}

run 4x_polish
run 4x_gan
run 3x_s1
run 3x_polish
run 3x_gan

# cache_meta.json is written LAST by build_sample_cache (after the npy
# flush), and build_cache builds train then eval — so eval_2x's meta is
# the completion signal for the whole 2X cache build.
echo "$(date -u +%T) waiting for 2X caches..."
until [ -f cache_r3/eval_2x/cache_meta.json ] && [ -f cache_r3/train_2x/cache_meta.json ]; do
  sleep 60
done

run 2x_s1
run 2x_polish
run 2x_gan
run unet_s1
run unet_polish
echo "$(date -u +%T) queue complete"
