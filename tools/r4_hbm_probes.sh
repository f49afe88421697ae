#!/bin/bash
# Round-4 train-step HBM lever probes (VERDICT r3 next-3), queued behind
# the baseline decomposition run.  Each probe re-runs the decomposition
# tool with one candidate lever toggled via TRAIN_OVERRIDES:
#   unroll8      — scan_unroll=8 for the TRAIN scan (inference already
#                  unrolls; ROADMAP: rolled while-loop spends ~40% of a
#                  sampling step slicing stacked weights + layout-
#                  converting carries)
#   nodrop       — dropout=0.0 (diagnosis only: isolates per-block pair-
#                  grid dropout RNG + mask traffic; NOT a production
#                  setting — changes training semantics)
#   unroll8_nodrop — both, to see whether the effects compose
set -u
cd "$(dirname "$0")/.."
LOGD=tools/pipeline_logs/quality_f4

wait_pid() {
  local p
  p=$(cat "$1" 2>/dev/null || echo "")
  [ -n "$p" ] && while kill -0 "$p" 2>/dev/null; do sleep 15; done
}

wait_pid /tmp/decomp.pid

run() {
  local name="$1" ovr="$2" var="$3"
  echo "$(date '+%F %T') probe $name"
  DECOMP_SC=off DECOMP_VARIANTS="$var" TRAIN_OVERRIDES="$ovr" \
    timeout 1800 python tools/train_hbm_decomp.py \
    > "$LOGD/hbm_${name}.log" 2>&1
  grep -a '^{' "$LOGD/hbm_${name}.log"
}

run unroll8 "model.scan_unroll=8" "loss,step"
run nodrop "model.dropout=0.0" "loss"
run unroll8_nodrop "model.scan_unroll=8,model.dropout=0.0" "loss,step"
echo "$(date '+%F %T') probes done"
