#!/bin/bash
# Round-5 allspectra campaign (VERDICT r5 next-1): the reference's HEADLINE
# training mode (ref scripts/training_scripts.sh) — fine-tune the 3-spectrum
# (uv+ir+raman) conditioning path from the fidelity-4 IR campaign state.
#
# Differences from the diverged r4 attempt (post-mortem in
# tools/diag_as_fwd.py + warm_state._merge_partial docstring):
#   * the fresh SpecFormer flatten-head kernel is ZEROED at the partial
#     restore (QUALITY_WARM_ZERO_FRESH default in tpu_quality_run.py), so
#     the context embedding starts at the trained distribution's centre
#     instead of feeding the trained adaLN trunk out-of-distribution noise;
#   * the train loop aborts on a non-finite loss, checkpoint saves are
#     finiteness-guarded, and the watchdog trips (rc=3, no restart) on a
#     `training_loss: nan` line.
#
# Usage: bash tools/r5_allspectra.sh [extra_steps=50000]
set -u
cd "$(dirname "$0")/.."
LOGD=tools/pipeline_logs/quality_as5
mkdir -p "$LOGD"

EXTRA=${1:-50000}
WARM=/root/repo/artifacts/warm_qm9s_f4.npz
BASE_STEP=$(python - "$WARM" <<'EOF'
import sys, numpy as np
print(int(np.load(sys.argv[1])["raw:step"]))
EOF
)
TARGET=$(( (BASE_STEP + EXTRA) / 1000 * 1000 ))
echo "$(date '+%F %T') allspectra-r5: warm from step $BASE_STEP, target $TARGET"

AS_OVR="data.bucket_sizes=(17,21,25,29),data.synthetic_fidelity=4,data.synthetic_cache='data/synthetic_cache',data.spectra_version='allspectra'"

rm -rf /root/repo/exp/quality_as5
TRAIN_WORKDIR=/root/repo/exp/quality_as5 \
QUALITY_DATA_SIZE=131072 \
QUALITY_STEPS=$TARGET \
QUALITY_SNAPSHOT=10000 \
QUALITY_WARM_START="$WARM" \
QUALITY_WARM_PARTIAL=1 \
QUALITY_LOG=tools/train_quality_as5.log \
WATCHDOG_MAX_RESTARTS=10 WATCHDOG_STALL_SECS=1200 WATCHDOG_COMPILE_GRACE=5400 \
TRAIN_OVERRIDES="$AS_OVR" \
  python tools/run_with_watchdog.py tools/train_quality_as5.log \
  python tools/tpu_quality_run.py > "$LOGD/watchdog.out" 2>&1
rc=$?
echo "$(date '+%F %T') allspectra-r5: train done rc=$rc; last steps:"
grep -aE "step: " tools/train_quality_as5.log | tail -3
if [ "$rc" = "3" ]; then
  echo "allspectra-r5: NON-FINITE trip — aborting phase (no eval)"
  exit 3
fi

# persist the campaign into the repo (scratch disk does not survive builds)
WARM_OUT=/root/repo/artifacts/warm_qm9s_as.npz \
TRAIN_WORKDIR=/root/repo/exp/quality_as5 QUALITY_DATA_SIZE=131072 \
TRAIN_OVERRIDES="$AS_OVR" \
  timeout 1500 python tools/export_warm_state.py > "$LOGD/export_warm.log" 2>&1 \
  && echo "warm state exported: artifacts/warm_qm9s_as.npz"

FC=$(ls -d /root/repo/exp/quality_as5/checkpoints/checkpoint_* 2>/dev/null \
  | sed 's/.*checkpoint_//' | grep -x '[0-9][0-9]*' | sort -n | tail -1)
echo "$(date '+%F %T') allspectra-r5: eval at ckpt $FC (2k targets, K=1)"
TRAIN_WORKDIR=/root/repo/exp/quality_as5 QUALITY_DATA_SIZE=131072 \
EVAL_CKPT="$FC" EVAL_SAMPLES=2000 EVAL_STEPS=1000 EVAL_CANDIDATES=1 \
EVAL_SUB_GEOMETRY=0 EVAL_SAVE_MOLS=false \
TRAIN_OVERRIDES="$AS_OVR" \
  timeout 7200 python tools/tpu_eval_10k.py > "$LOGD/eval_2k.log" 2>&1 || true
grep -aE "exact match|valid|stab|unseen|Top" "$LOGD/eval_2k.log" | tail -20 || true
echo "$(date '+%F %T') allspectra-r5 phase done"
