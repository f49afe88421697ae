#!/bin/bash
# Round-4 eval phases, run after the fidelity-4 campaign's watchdog exits.
#
# Job list (VERDICT r3 items in parentheses):
#   1. export + commit the f4 warm state
#   2. f4 reference protocol, 10k targets / K=1 / 1000-step ancestral (next-1)
#   3. f4 REFERENCE-SIZE Top-K: 10k targets / K=10 / 1000-step (next-1+next-5
#      — the Top-10 >= 95% interventional verdict at full protocol size)
#   4. bench.py (north-star JSON)
#   5. fidelity-3 full protocol from the committed 915k warm state:
#      rehydrate ckpt, 10k K=1, then 2k K=10 + consensus (next-2)
#   6. n-free elucidator quantification on the f4 final state (next-7)
#   7. whole-block Pallas kernel hardware validation + pallas bench (next-4)
#
# Each job logs under tools/pipeline_logs/quality_f4/ with a DONE marker so
# the script can be relaunched idempotently.
set -u
cd "$(dirname "$0")/.."

LOGD=tools/pipeline_logs/quality_f4
mkdir -p "$LOGD"
export TRAIN_WORKDIR=/root/repo/exp/quality_f4
export QUALITY_DATA_SIZE=131072
EV="data.synthetic_fidelity=4,data.synthetic_cache='data/synthetic_cache'"

wd_pid=$(cat /tmp/watchdog.pid 2>/dev/null || echo "")
if [ -n "$wd_pid" ]; then
  echo "$(date '+%F %T') r4-eval: waiting on watchdog pid $wd_pid"
  while kill -0 "$wd_pid" 2>/dev/null; do sleep 60; done
fi
echo "$(date '+%F %T') r4-eval: training done; starting jobs"

run_job() {
  local name="$1"; shift
  local log="$LOGD/${name}.log"
  if [ -f "$log" ] && tail -1 "$log" | grep -q "^DONE rc=0"; then
    echo "r4-eval: $name already DONE, skipping"
    return 0
  fi
  echo "$(date '+%F %T') r4-eval: running $name"
  "$@" > "$log" 2>&1
  local rc=$?
  echo "DONE rc=$rc" >> "$log"
  echo "$(date '+%F %T') r4-eval: $name finished rc=$rc"
}

# trust the filesystem for the final checkpoint number
FC=$(ls -d "$TRAIN_WORKDIR"/checkpoints/checkpoint_* 2>/dev/null \
  | sed 's/.*checkpoint_//' | grep -x '[0-9][0-9]*' | sort -n | tail -1)
FC="${FC:-39}"
echo "r4-eval: final checkpoint $FC"

# 1. persist the f4 weights
run_job export_warm_f4 env WARM_OUT=/root/repo/artifacts/warm_qm9s_f4.npz \
  TRAIN_OVERRIDES="$EV" timeout 1800 python tools/export_warm_state.py
if [ -f /root/repo/artifacts/warm_qm9s_f4.npz ]; then
  git -C /root/repo add -- artifacts/warm_qm9s_f4.npz
  git -C /root/repo commit -m \
    "Fidelity-4 campaign warm state (final checkpoint export)" \
    -- artifacts/warm_qm9s_f4.npz || true
fi

# 2. f4 reference protocol, K=1 (budget-table row + full metric suite)
run_job f4_eval_10k env EVAL_CKPT="$FC" EVAL_SAMPLES=10000 EVAL_STEPS=1000 \
  TRAIN_OVERRIDES="$EV" timeout 7200 python tools/tpu_eval_10k.py

# 3. f4 reference-size Top-K protocol: 10k targets x 10 candidates x
# 1000 ancestral steps = 100k reverse diffusions (~75 min at 23.5 mols/s)
run_job f4_topk_10k env EVAL_CKPT="$FC" EVAL_SAMPLES=10000 EVAL_STEPS=1000 \
  EVAL_CANDIDATES=10 EVAL_SUB_GEOMETRY=0 EVAL_SAVE_MOLS=false \
  TRAIN_OVERRIDES="$EV" timeout 14400 python tools/tpu_eval_10k.py

# 4. bench (north-star)
run_job bench timeout 3600 python bench.py

# 5. fidelity-3 full protocol (VERDICT next-2) from the committed 915k state
run_job f3_rehydrate env WARM=/root/repo/artifacts/warm_qm9s_f3.npz \
  WORKDIR=/root/repo/exp/quality_f3 \
  TRAIN_OVERRIDES="data.synthetic_fidelity=3,data.synthetic_cache='data/synthetic_cache'" \
  timeout 1800 python tools/warm_to_ckpt.py
F3EV="data.synthetic_fidelity=3,data.synthetic_cache='data/synthetic_cache'"
# full metric suite incl. ring geometry MMD on 2k targets (K=1), then the
# Top-K + consensus protocol on the same 2k targets (K=10)
run_job f3_eval_2k env TRAIN_WORKDIR=/root/repo/exp/quality_f3 \
  QUALITY_DATA_SIZE=32768 EVAL_CKPT=36 EVAL_SAMPLES=2000 EVAL_STEPS=1000 \
  TRAIN_OVERRIDES="$F3EV" timeout 7200 python tools/tpu_eval_10k.py
run_job f3_topk_2k env TRAIN_WORKDIR=/root/repo/exp/quality_f3 \
  QUALITY_DATA_SIZE=32768 EVAL_CKPT=36 EVAL_SAMPLES=2000 EVAL_STEPS=1000 \
  EVAL_CANDIDATES=10 EVAL_SUB_GEOMETRY=0 EVAL_SAVE_MOLS=false \
  TRAIN_OVERRIDES="$F3EV" timeout 7200 python tools/tpu_eval_10k.py

# 6. n-free elucidator quantification on the f4 final state
run_job nfree_eval env WARM=/root/repo/artifacts/warm_qm9s_f4.npz \
  SIZE=131072 FIDELITY=4 NT=512 STEPS=100 METHOD=dpm_solver_sde \
  OUT="$LOGD/nfree_eval.json" timeout 7200 python tools/nfree_eval.py

# 7. whole-block kernel on hardware: parity + chain timing, then the bench
# sweep with the kernel dispatched
run_job diag_block timeout 3600 python tools/diag_block.py
run_job bench_block env BENCH_PALLAS=1 BENCH_PALLAS_OPS=block \
  timeout 3600 python bench.py

# 8. train-step HBM probes (VERDICT next-3 evidence base): baseline +
# the named candidate levers, same measurement protocol
run_job train_mfu timeout 3600 python tools/train_mfu.py
run_job train_mfu_sfbf16 env \
  TRAIN_OVERRIDES="model.specformer_bf16=True" \
  timeout 3600 python tools/train_mfu.py

echo "$(date '+%F %T') r4-eval: ALL JOBS DONE"
