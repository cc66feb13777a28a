#!/usr/bin/env bash
# Round-4 chained queue D: waits for tools/queue_r4c.sh, then refreshes
# every README perf row on the real chip — including the round-4
# compute-only streaming/serving scenarios (VERDICT r3 Weak #3) — and
# closes with the headline bench.
#
#   bash tools/queue_r4d.sh   (logs: /tmp/bench_suite_r4.log, /tmp/bench_r4.log)
set -uo pipefail
cd "$(dirname "$0")/.."

if [ -f /tmp/queue_r4c.pid ]; then
  qpid=$(cat /tmp/queue_r4c.pid)
  while kill -0 "$qpid" 2>/dev/null; do
    echo "$(date -u +%T) waiting for queue_r4c (pid $qpid)"
    sleep 60
  done
fi
echo "$(date -u +%T) queue_r4c done; running bench suite"

for attempt in 1 2; do
  if timeout 3600 python -m ultrazoom_tpu.tools.bench_suite > /tmp/bench_suite_r4.log 2>&1; then
    echo "$(date -u +%T) bench_suite OK"; break
  fi
  echo "$(date -u +%T) bench_suite FAILED/timed out (attempt $attempt)"
done

python bench.py > /tmp/bench_r4.log 2>&1 \
  && echo "$(date -u +%T) bench.py OK" \
  || echo "$(date -u +%T) bench.py FAILED"
echo "$(date -u +%T) queue D complete"
