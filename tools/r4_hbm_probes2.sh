#!/bin/bash
# Second HBM lever wave, queued behind r4_hbm_probes.sh: the production-
# honest RNG lever (training.prng_impl='rbg' — same dropout semantics,
# TPU-native bit generation) alone and combined with scan unrolling.
set -u
cd "$(dirname "$0")/.."
LOGD=tools/pipeline_logs/quality_f4

p=$(cat /tmp/probes.pid 2>/dev/null || echo "")
[ -n "$p" ] && while kill -0 "$p" 2>/dev/null; do sleep 15; done

run() {
  local name="$1" ovr="$2" var="$3"
  echo "$(date '+%F %T') probe $name"
  DECOMP_SC=off DECOMP_VARIANTS="$var" TRAIN_OVERRIDES="$ovr" \
    timeout 1800 python tools/train_hbm_decomp.py \
    > "$LOGD/hbm_${name}.log" 2>&1
  grep -a '^{' "$LOGD/hbm_${name}.log"
}

run rbg "training.prng_impl='rbg'" "loss,step"
run rbg_unroll8 "training.prng_impl='rbg',model.scan_unroll=8" "loss,step"
echo "$(date '+%F %T') probes2 done"
