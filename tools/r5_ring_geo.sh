#!/bin/bash
# Ring 3D geometry diagnosis (VERDICT r5 next-7): the f3 ring campaign's
# bond/angle/dihedral MMD sits ~3 orders of magnitude above the GT-vs-GT
# floor (1.43/1.86/1.73 vs 0.0065/0.0019/0.0004, tools/gt_mmd_anchor.py)
# while ring GRAPHS recover well (unseen Top-10 77.5%). This sweep
# separates sampler-bound from model-bound: if no sampler/temperature
# variant moves the MMD materially, the gap is in the learned positional
# distribution (objective- or data-fidelity-bound), not the sampler.
#
#   a. ancestral 1000 steps, T=1.0  (campaign baseline, reproduced)
#   b. ancestral 1000 steps, T=0.7  (lower-T sharpening)
#   c. dpm_solver ODE 100 steps     (deterministic probability-flow)
#
# Usage: bash tools/r5_ring_geo.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOGD=${1:-tools/pipeline_logs/r5}
mkdir -p "$LOGD"

F3EV="data.synthetic_fidelity=3,data.synthetic_cache='data/synthetic_cache'"

if [ ! -d /root/repo/exp/quality_f3/checkpoints/checkpoint_36 ]; then
  WARM=/root/repo/artifacts/warm_qm9s_f3.npz \
  WORKDIR=/root/repo/exp/quality_f3 \
  TRAIN_OVERRIDES="$F3EV" \
    timeout 1800 python tools/warm_to_ckpt.py > "$LOGD/f3_rehydrate.log" 2>&1
fi

run_eval() {
  local tag="$1" extra="$2" method="$3" steps="$4"
  local log="$LOGD/ring_${tag}.log"
  if [ -f "$log" ] && grep -aq "TOTAL EVAL WALL" "$log"; then
    echo "ring_geo: $tag already done"; return 0
  fi
  echo "$(date '+%F %T') ring_geo: $tag"
  TRAIN_WORKDIR=/root/repo/exp/quality_f3 QUALITY_DATA_SIZE=32768 \
  EVAL_CKPT=36 EVAL_SAMPLES=1000 EVAL_STEPS="$steps" EVAL_METHOD="$method" \
  EVAL_CANDIDATES=1 EVAL_SUB_GEOMETRY=1 EVAL_SAVE_MOLS=false \
  TRAIN_OVERRIDES="$F3EV$extra" \
    timeout 5400 python tools/tpu_eval_10k.py > "$log" 2>&1 || true
  grep -aE "MMD|stab|valid" "$log" | tail -8
}

run_eval base "" ancestral 1000
run_eval t07 ",eval.sampling_temperature=0.7" ancestral 1000
run_eval dpm_ode "" dpm_solver 100
echo "$(date '+%F %T') ring_geo sweep done"
