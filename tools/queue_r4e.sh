#!/usr/bin/env bash
# Round-4 chained queue E: waits for tools/queue_r4d.sh, then
#   1. ganE — the sweep-informed GAN recipe (tools/recipes_r4.sh ganE;
#      knobs refinable until this stage starts, the recipe file is
#      re-read fresh).  Captures the best-VIF epoch via
#      --best_checkpoint_metric (finetune keeps only the latest state
#      otherwise, and GAN evals oscillate).
#   2. eval — all GAN checkpoints AND their _best snapshots on the
#      held-out fixed-degradation pairs (tools/eval_r4.sh).
#
#   bash tools/queue_r4e.sh   (logs: /tmp/train_ganE.log, /tmp/eval_r4_gan.log)
set -uo pipefail
cd "$(dirname "$0")/.."

if [ -f /tmp/queue_r4d.pid ]; then
  qpid=$(cat /tmp/queue_r4d.pid)
  while kill -0 "$qpid" 2>/dev/null; do
    echo "$(date -u +%T) waiting for queue_r4d (pid $qpid)"
    sleep 60
  done
fi
echo "$(date -u +%T) queue_r4d done; starting ganE"

for attempt in 1 2 3 4; do
  echo "$(date -u +%T) === ganE (attempt $attempt) ==="
  if bash tools/recipes_r4.sh ganE > /tmp/train_ganE.log 2>&1; then
    echo "$(date -u +%T) ganE OK"; break
  fi
  echo "$(date -u +%T) ganE FAILED (see /tmp/train_ganE.log)"
done

{
  for g in A B C D E; do
    bash tools/eval_r4.sh "r4_gan$g" 2
    bash tools/eval_r4.sh "r4_gan${g}_best" 2
  done
} > /tmp/eval_r4_gan.log 2>&1
echo "$(date -u +%T) queue E complete"
