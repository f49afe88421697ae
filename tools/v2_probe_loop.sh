#!/bin/bash
# Mid-campaign probe evals for the v2 quality run: whenever a new numbered
# checkpoint appears, run a small fixed-protocol eval (256 targets,
# DPM-Solver++ 100 steps) so the scaling table gets a fine-grained
# steps -> Top-1 curve without waiting for the full post-training pipeline.
# Logs to tools/pipeline_logs/v2/probe_ckpt<N>.log. Exits when the training
# watchdog is gone (the main pipeline takes over from there).
#
# CONTENTION CAVEAT (measured 2026-08-19): on a SINGLE-chip host the probe's
# 100-step DPM sweep starves the training process of the TPU for its whole
# ~25min duration — long enough to trip the training watchdog's 1200s stall
# timer, which then kills and restarts a perfectly healthy trainer (~20min
# of restore/upload/compile lost per probe). Net effect is roughly HALVED
# campaign throughput. Therefore: when a training watchdog is alive, this
# loop now refuses to start unless PROBE_DESPITE_TRAINING=1 (use only on
# multi-chip hosts where the probe can run on its own device). The
# post-training pipeline (session_pipeline.sh MID_CKPTS) provides the
# scaling-table points instead.
set -u
if [ "${PROBE_DESPITE_TRAINING:-0}" != "1" ]; then
  wd_pid=$(cat /tmp/watchdog.pid 2>/dev/null || echo "")
  if [ -n "$wd_pid" ] && kill -0 "$wd_pid" 2>/dev/null; then
    echo "probe-loop: training watchdog $wd_pid is alive and" \
      "PROBE_DESPITE_TRAINING != 1 — refusing to contend for the chip"
    exit 0
  fi
fi
cd "$(dirname "$0")/.."
WD=/root/repo/exp/quality_v2
mkdir -p tools/pipeline_logs/v2

while true; do
  wd_pid=$(cat /tmp/watchdog.pid 2>/dev/null || echo "")
  if [ -z "$wd_pid" ] || ! kill -0 "$wd_pid" 2>/dev/null; then
    echo "$(date '+%F %T') probe-loop: watchdog gone, exiting"
    exit 0
  fi
  latest=$(ls -d "$WD"/checkpoints/checkpoint_* 2>/dev/null \
    | sed 's/.*checkpoint_//' | grep -x '[0-9][0-9]*' | sort -n | tail -1)
  if [ -n "$latest" ]; then
    log="tools/pipeline_logs/v2/probe_ckpt${latest}.log"
    if [ ! -f "$log" ]; then
      echo "$(date '+%F %T') probe-loop: probing checkpoint $latest"
      env TRAIN_WORKDIR="$WD" QUALITY_DATA_SIZE=65536 \
        EVAL_CKPT="$latest" EVAL_SAMPLES=256 EVAL_STEPS=100 \
        EVAL_METHOD=dpm_solver EVAL_SUB_GEOMETRY=0 EVAL_SAVE_MOLS=false \
        TRAIN_OVERRIDES="data.synthetic_fidelity=2,data.synthetic_cache='/root/repo/data/synthetic_cache'" \
        timeout 2400 python tools/tpu_eval_10k.py > "$log" 2>&1
      echo "DONE rc=$?" >> "$log"
    fi
  fi
  sleep 120
done
