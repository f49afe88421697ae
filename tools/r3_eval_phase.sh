#!/bin/bash
# Round-3 TPU eval phase (run after the v3ext trainer exits):
#   A. train-step MFU accounting (tools/train_mfu.py)
#   B1. v3ext headline eval: 10k targets, 1000-step ancestral, K=1
#   B2. v3ext Top-K/consensus: 2k targets, 1000-step ancestral, K=10
# Logs under tools/pipeline_logs/quality_v3ext_r3/.
set -u
cd "$(dirname "$0")/.."
LOGD=tools/pipeline_logs/quality_v3ext_r3
mkdir -p "$LOGD"

export TRAIN_WORKDIR=/root/repo/exp/quality_v3
export QUALITY_DATA_SIZE=131072
export TRAIN_OVERRIDES="data.synthetic_fidelity=2,data.synthetic_cache='data/synthetic_cache'"

echo "$(date '+%F %T') A: train MFU"
timeout 900 python tools/train_mfu.py > "$LOGD/train_mfu.json" 2> "$LOGD/train_mfu.err" || true
cat "$LOGD/train_mfu.json" || true

echo "$(date '+%F %T') B1: 10k K=1 eval"
EVAL_CKPT=${EVAL_CKPT:-35} EVAL_SAMPLES=10000 EVAL_STEPS=1000 EVAL_CANDIDATES=1 \
  timeout 4800 python tools/tpu_eval_10k.py > "$LOGD/eval_10k_k1.log" 2>&1 || true
grep -aE "exact match|Top|stab|valid|Scaf|SNN|FCD|MCES|consensus|generaliz" \
  "$LOGD/eval_10k_k1.log" | tail -40 || true

echo "$(date '+%F %T') B2: 2k K=10 Top-K eval"
EVAL_CKPT=${EVAL_CKPT:-35} EVAL_SAMPLES=2000 EVAL_STEPS=1000 EVAL_CANDIDATES=10 \
  timeout 5400 python tools/tpu_eval_10k.py > "$LOGD/eval_2k_k10.log" 2>&1 || true
grep -aE "exact match|Top|consensus|generaliz" "$LOGD/eval_2k_k10.log" | tail -40 || true

echo "$(date '+%F %T') eval phase done"
