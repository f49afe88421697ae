#!/bin/bash
# Resume the quality run once the TPU backend responds, then run the
# post-training chip-job pipeline (tools/session_pipeline.sh).
#
# Exists because the TPU relay in this environment has multi-minute to
# multi-hour outages (tools/run_with_watchdog.py docstring): probing first
# is cheaper than burning watchdog compile-grace windows on a dead backend.
#
# The step target adapts to the remaining wall clock: the longer the outage,
# the lower the target, so the eval pipeline always gets its ~2.5h budget.
# TRAIN_DEADLINE_EPOCH (secs) caps when training must END; default is set by
# the launcher for the current session.
set -u
cd "$(dirname "$0")/.."

echo "$(date '+%F %T') resume: probing TPU backend"
until timeout 300 python tools/tpu_probe.py; do
  echo "$(date '+%F %T') resume: TPU unavailable, retrying in 180s"
  sleep 180
done

# adaptive step target: resume point + steps that fit before the deadline
# at a conservative 110ms/step (measured 99ms + save/restart overhead)
RESUME_STEP="${RESUME_STEP:-308000}"
MAX_STEPS="${MAX_STEPS:-500000}"
MIN_STEPS="${MIN_STEPS:-325000}"
now=$(date +%s)
deadline="${TRAIN_DEADLINE_EPOCH:-$((now + 21600))}"
fit=$(( RESUME_STEP + (deadline - now) * 1000 / 110 ))
target=$fit
[ "$target" -gt "$MAX_STEPS" ] && target=$MAX_STEPS
[ "$target" -lt "$MIN_STEPS" ] && target=$MIN_STEPS
# align to the 25k snapshot cadence so the last checkpoint is numbered
target=$(( target / 25000 * 25000 ))
final_ckpt=$(( target / 25000 ))
echo "$(date '+%F %T') resume: TPU healthy; step target $target (ckpt $final_ckpt)"

QUALITY_STEPS="$target" WATCHDOG_MAX_RESTARTS=40 \
  python tools/run_with_watchdog.py tools/quality_run.log \
  python tools/tpu_quality_run.py > /tmp/watchdog.out 2>&1 &
echo $! > /tmp/watchdog.pid
echo "$(date '+%F %T') resume: watchdog pid $(cat /tmp/watchdog.pid)"

FINAL_CKPT="$final_ckpt" bash tools/session_pipeline.sh
