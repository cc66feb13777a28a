#!/usr/bin/env bash
# Round-3 sequential training queue (one v5e chip), dependency-aware:
# a family's later stages are skipped when an earlier one fails, and
# every stage gets ONE retry (the axon tunnel's remote compile service
# occasionally 500s on a fresh shape).  Stages already finished (their
# checkpoint meta.json exists AND the stage log says OK) can be skipped
# by listing them in SKIP.  Logs per stage under /tmp/train_<stage>.log.
#
#   bash tools/queue_r3.sh [skip_stage ...]
set -uo pipefail
cd "$(dirname "$0")/.."

SKIP=" $* "

run() { # stage -> 0/1
  case "$SKIP" in *" $1 "*) echo "$(date -u +%T) stage $1 skipped"; return 0;; esac
  for attempt in 1 2 3 4; do  # auto_resume makes retries continue, not restart
    echo "$(date -u +%T) === stage $1 (attempt $attempt) ==="
    if bash tools/recipes_r3.sh "$1" > "/tmp/train_$1.log" 2>&1; then
      echo "$(date -u +%T) stage $1 OK"
      return 0
    fi
    echo "$(date -u +%T) stage $1 FAILED (see /tmp/train_$1.log)"
  done
  return 1
}

run 4x_gan || true
run 3x_s1 && run 3x_polish && run 3x_gan
run 2x_s1 && run 2x_polish && run 2x_gan
run unet_s1 && run unet_polish
echo "$(date -u +%T) queue complete"
