#!/bin/bash
# Round-4 fidelity-4 campaign launcher (train phase only).
#
# The interventional test of the Top-10 information-ceiling claim
# (VERDICT r3 next-1): fine-tune the v3ext 875k-step state on the
# 131,072-molecule fidelity-4 set, whose local-environment peaks are
# CONTINUOUS functions of structure (data/synthetic.py fidelity>=4)
# instead of WL-hash keyed. Same structure distribution, same size, same
# protocol as the fidelity-2 campaign — the only variable that changes is
# the spectrum keying, so any unseen-target Top-10 movement is
# attributable to the information pathology being removed.
#
# Derived from tools/resume_train_and_pipeline.sh; the eval phases are
# driven separately (the round-4 job list differs: 10k K=10 headline,
# fidelity-3 full protocol, n-free elucidator quantification).
set -u
cd "$(dirname "$0")/.."

export TRAIN_WORKDIR=/root/repo/exp/quality_f4
export QUALITY_DATA_SIZE=131072
export EVAL_OVERRIDES="data.synthetic_fidelity=4,data.synthetic_cache='data/synthetic_cache'"
export TRAIN_OVR="data.bucket_sizes=(17,21,25,29),$EVAL_OVERRIDES"
export PIPE_TAG=quality_f4
export QUALITY_LOG=tools/train_quality_f4.log
export WARM_NPZ=/root/repo/artifacts/warm_qm9s_ir.npz
# periodic warm-export loop must write the f4 state, never overwrite the
# committed fidelity-2 875k headline state
export WARM_OUT=/root/repo/artifacts/warm_qm9s_f4.npz

echo "$(date '+%F %T') r4: probing TPU backend"
until timeout 900 python tools/tpu_probe.py; do
  echo "$(date '+%F %T') r4: TPU unavailable, retrying in 180s"
  sleep 180
done

RESUME_STEP=""
if [ -d "$TRAIN_WORKDIR/checkpoints-meta/checkpoint" ]; then
  RESUME_STEP=$(grep -oa "step: [0-9]*" "$QUALITY_LOG" 2>/dev/null \
    | tail -1 | grep -o "[0-9]*$")
fi
if [ -z "$RESUME_STEP" ]; then
  RESUME_STEP=$(python - "$WARM_NPZ" <<'EOF'
import sys, numpy as np
print(int(np.load(sys.argv[1])["raw:step"]))
EOF
)
  echo "$(date '+%F %T') r4: warm start from $WARM_NPZ at step $RESUME_STEP"
fi
export QUALITY_WARM_START="$WARM_NPZ"

MAX_STEPS="${MAX_STEPS:-1050000}"
MIN_STEPS=$(( RESUME_STEP + 25000 ))
now=$(date +%s)
deadline="${TRAIN_DEADLINE_EPOCH:-$((now + 11400))}"
fit=$(( RESUME_STEP + (deadline - now) * 1000 / 90 ))
target=$fit
[ "$target" -gt "$MAX_STEPS" ] && target=$MAX_STEPS
[ "$target" -lt "$MIN_STEPS" ] && target=$MIN_STEPS
target=$(( target / 25000 * 25000 ))
echo "$(date '+%F %T') r4: step target $target (ckpt $(( target / 25000 )))"

QUALITY_STEPS="$target" WATCHDOG_MAX_RESTARTS=40 WATCHDOG_STALL_SECS=1200 \
  WATCHDOG_COMPILE_GRACE=5400 \
  TRAIN_OVERRIDES="$TRAIN_OVR" \
  python tools/run_with_watchdog.py "$QUALITY_LOG" \
  python tools/tpu_quality_run.py > /tmp/watchdog.out 2>&1 &
echo $! > /tmp/watchdog.pid
echo "$(date '+%F %T') r4: watchdog pid $(cat /tmp/watchdog.pid)"

bash tools/periodic_warm_export.sh > /tmp/warm_export_loop.log 2>&1 &
echo $! > /tmp/warm_export.pid
echo "$(date '+%F %T') r4: warm-export loop pid $(cat /tmp/warm_export.pid)"
