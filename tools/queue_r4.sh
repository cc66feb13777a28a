#!/usr/bin/env bash
# Round-4 sequential training queue (one v5e chip).  Same contract as
# tools/queue_r3.sh: dependency-aware, each stage retried (auto_resume makes
# a retry continue from the last checkpoint, not restart), stages listed on
# the command line are skipped.  Logs under /tmp/train_<stage>.log.
#
#   bash tools/queue_r4.sh [skip_stage ...]
set -uo pipefail
cd "$(dirname "$0")/.."

SKIP=" $* "

run() { # stage -> 0/1
  case "$SKIP" in *" $1 "*) echo "$(date -u +%T) stage $1 skipped"; return 0;; esac
  for attempt in 1 2 3 4; do
    echo "$(date -u +%T) === stage $1 (attempt $attempt) ==="
    if bash tools/recipes_r4.sh "$1" > "/tmp/train_$1.log" 2>&1; then
      echo "$(date -u +%T) stage $1 OK"
      return 0
    fi
    echo "$(date -u +%T) stage $1 FAILED (see /tmp/train_$1.log)"
  done
  return 1
}

run unet_s1 && run unet_polish
run gan_base && run ganA && run ganB && run ganC && run ganD
run x8_cache && run x8_tiny
echo "$(date -u +%T) queue complete"
