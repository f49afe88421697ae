#!/bin/bash
# Resume the 500k-step quality run once the TPU backend responds, then run
# the post-training chip-job pipeline (tools/session_pipeline.sh).
#
# Exists because the TPU relay in this environment has multi-minute to
# multi-hour outages (tools/run_with_watchdog.py docstring): probing first
# is cheaper than burning watchdog compile-grace windows on a dead backend.
set -u
cd "$(dirname "$0")/.."

echo "$(date '+%F %T') resume: probing TPU backend"
until timeout 300 python tools/tpu_probe.py; do
  echo "$(date '+%F %T') resume: TPU unavailable, retrying in 180s"
  sleep 180
done

echo "$(date '+%F %T') resume: TPU healthy, launching watchdog training"
QUALITY_STEPS="${QUALITY_STEPS:-500000}" WATCHDOG_MAX_RESTARTS=40 \
  python tools/run_with_watchdog.py tools/quality_run.log \
  python tools/tpu_quality_run.py > /tmp/watchdog.out 2>&1 &
echo $! > /tmp/watchdog.pid
echo "$(date '+%F %T') resume: watchdog pid $(cat /tmp/watchdog.pid)"

bash tools/session_pipeline.sh
