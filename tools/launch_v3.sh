#!/bin/bash
# v3 dataset-scaling campaign launcher (session 5).
#
# Waits for the still-running v2 post-training pipeline (a previous
# session's tools/session_pipeline.sh) to release the chip, then resumes
# training via tools/resume_train_and_pipeline.sh with the v3 parameters:
#   - 131,072-molecule fidelity-2 synthetic set (disk-cached; 2x the v2
#     set — RESULTS.md names dataset scale, not steps, as the axis that
#     moves the honest unseen-target number next)
#   - warm start from the committed v2 600k-step weights
#     (artifacts/warm_qm9s_ir.npz — picked up automatically)
#   - TRAIN_DEADLINE_EPOCH sized so the eval pipeline (warm export +
#     10k/1000-step eval + two Top-K protocols) still fits in the round.
# Already-measured probe jobs are pre-marked DONE in
# tools/pipeline_logs/quality_v3/ so only the v3 eval jobs run.
set -u
cd "$(dirname "$0")/.."

PIPE_PID="${1:?usage: launch_v3.sh <v2-pipeline-pid> <train-deadline-epoch>}"
DEADLINE="${2:?}"

echo "$(date '+%F %T') launch_v3: waiting on v2 pipeline pid $PIPE_PID"
while kill -0 "$PIPE_PID" 2>/dev/null; do sleep 30; done
echo "$(date '+%F %T') launch_v3: chip free, starting v3 campaign"

TRAIN_WORKDIR=/root/repo/exp/quality_v3 \
QUALITY_DATA_SIZE=131072 \
EVAL_OVERRIDES="data.synthetic_fidelity=2,data.synthetic_cache='data/synthetic_cache'" \
MAX_STEPS=2000000 \
MID_CKPTS="0" \
TRAIN_DEADLINE_EPOCH="$DEADLINE" \
bash tools/resume_train_and_pipeline.sh
