#!/bin/bash
# Allspectra campaign (VERDICT r3 next-6): fine-tune the 3-spectrum
# (uv+ir+raman) conditioning path — the reference's HEADLINE mode
# (ref scripts/training_scripts.sh) — from the fidelity-4 IR campaign
# state via the partial warm start (DMT trunk restored, SpecFormer patch
# embedders fresh for the 347-patch 3-spectrum layout), then a quick
# accuracy probe against the IR-only numbers.
#
# Usage: bash tools/r4_allspectra.sh [extra_steps=25000]
set -u
cd "$(dirname "$0")/.."
LOGD=tools/pipeline_logs/quality_as
mkdir -p "$LOGD"

EXTRA=${1:-25000}
WARM=/root/repo/artifacts/warm_qm9s_f4.npz
BASE_STEP=$(python - "$WARM" <<'EOF'
import sys, numpy as np
print(int(np.load(sys.argv[1])["raw:step"]))
EOF
)
TARGET=$(( (BASE_STEP + EXTRA) / 1000 * 1000 ))
echo "$(date '+%F %T') allspectra: warm from step $BASE_STEP, target $TARGET"

AS_OVR="data.bucket_sizes=(17,21,25,29),data.synthetic_fidelity=4,data.synthetic_cache='data/synthetic_cache',data.spectra_version='allspectra'"

TRAIN_WORKDIR=/root/repo/exp/quality_as \
QUALITY_DATA_SIZE=131072 \
QUALITY_STEPS=$TARGET \
QUALITY_SNAPSHOT=5000 \
QUALITY_WARM_START="$WARM" \
QUALITY_WARM_PARTIAL=1 \
QUALITY_LOG=tools/train_quality_as.log \
WATCHDOG_MAX_RESTARTS=10 WATCHDOG_STALL_SECS=1200 WATCHDOG_COMPILE_GRACE=5400 \
TRAIN_OVERRIDES="$AS_OVR" \
  python tools/run_with_watchdog.py tools/train_quality_as.log \
  python tools/tpu_quality_run.py > "$LOGD/watchdog.out" 2>&1
echo "$(date '+%F %T') allspectra: train done; last steps:"
grep -aE "step: " tools/train_quality_as.log | tail -3

FC=$(ls -d /root/repo/exp/quality_as/checkpoints/checkpoint_* 2>/dev/null \
  | sed 's/.*checkpoint_//' | grep -x '[0-9][0-9]*' | sort -n | tail -1)
echo "$(date '+%F %T') allspectra: eval at ckpt $FC (2k targets, K=1)"
TRAIN_WORKDIR=/root/repo/exp/quality_as QUALITY_DATA_SIZE=131072 \
EVAL_CKPT="$FC" EVAL_SAMPLES=2000 EVAL_STEPS=1000 EVAL_CANDIDATES=1 \
EVAL_SUB_GEOMETRY=0 EVAL_SAVE_MOLS=false \
TRAIN_OVERRIDES="data.synthetic_fidelity=4,data.synthetic_cache='data/synthetic_cache',data.spectra_version='allspectra'" \
  timeout 7200 python tools/tpu_eval_10k.py > "$LOGD/eval_2k.log" 2>&1 || true
grep -aE "exact match|valid|stab|unseen" "$LOGD/eval_2k.log" | tail -20 || true
echo "$(date '+%F %T') allspectra phase done"
