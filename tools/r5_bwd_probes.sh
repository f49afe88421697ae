#!/bin/bash
# Round-5 backward-bandwidth probes (VERDICT r5 next-5: 56% -> >=65% of HBM
# peak, or a byte-level proof the VJP traffic is irreducible).
#
# The r4 decomposition pinned the residual train-step gap on the backward's
# pair-grid einsum VJPs (415 GB/s). The r3 remat-policy measurements
# predate the rbg PRNG default (threefry regeneration dominated the remat'd
# backward then) — re-measure the remat/unroll matrix under rbg before any
# custom_vjp surgery: 'dots' saves matmul recomputes in the backward at the
# cost of storing their outputs, and with the RNG cost gone the trade may
# have flipped.
#
# Usage: bash tools/r5_bwd_probes.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOGD=${1:-tools/pipeline_logs/r5}
mkdir -p "$LOGD"

run() {
  tag=$1; shift
  echo "== $tag: TRAIN_OVERRIDES=$*"
  TRAIN_OVERRIDES="$*" MFU_STEPS=30 timeout 1800 \
    python tools/train_mfu.py 2>"$LOGD/mfu_$tag.err" \
    | tee "$LOGD/mfu_$tag.json"
}

# Trimmed to the three highest-information probes: every fresh compile
# costs 2-10 min of the remote helper, and the chip window between the
# allspectra campaign and the f4 continuation is the f4 crossing's
# training time (VERDICT next-2 outranks next-5).
run baseline_rbg ""
run dots "model.remat_policy='dots'"
# no-remat at reduced batch: measures the pure (no-recompute) backward's
# bandwidth so the remat overhead is separable from the VJP traffic itself
MFU_BATCH=48 TRAIN_OVERRIDES="model.remat_policy='none'" MFU_STEPS=30 \
  timeout 1800 python tools/train_mfu.py 2>"$LOGD/mfu_noremat_b48.err" \
  | tee "$LOGD/mfu_noremat_b48.json"
MFU_BATCH=48 TRAIN_OVERRIDES="" MFU_STEPS=30 \
  timeout 1800 python tools/train_mfu.py 2>"$LOGD/mfu_full_b48.err" \
  | tee "$LOGD/mfu_full_b48.json"
echo "bwd probes done"
