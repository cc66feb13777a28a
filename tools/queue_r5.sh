#!/usr/bin/env bash
# Round-5 opening queue: the only experiment left open at the end of
# round 4 is the corrected-anneal 4X retrain (queue-I stages 0/3/4 —
# the GAN gate, TTA rows, and bench refresh all completed in round 4).
# Delegates to queue_r4i.sh with the finished stages skipped:
#   - cache4x: no-op if cache_r3/train_4x survived (round 4 left a
#     background rebuild running; deterministic seeds either way)
#   - r4_4x_s1 / r4_4x_polish: 64-epoch cosine s1 (horizon INSIDE the
#     epoch budget, unlike the shipped run's truncated anneal) + 30 ep
#     pixel_ssim polish, snapshot-committed every 45 min, --auto_resume
#   - x4_gate: re-packages artifacts/mewzoom-tpu-4x-ctrl IFF all three
#     metrics beat the shipped round-3 numbers (23.089/0.5619/0.3815)
#
#   bash tools/queue_r5.sh
set -uo pipefail
cd "$(dirname "$0")/.."
exec bash tools/queue_r4i.sh \
  ganE commit_ganE ganF commit_ganF gan_gate tta bench_suite bench
