#!/bin/bash
# Round-4 eval phases, run after the fidelity-4 campaign's watchdog exits.
# Ordered by VERDICT-r3 value density against the remaining wall clock:
#   1. export + commit the f4 warm state
#   2. f4 2k-target K=10 Top-K — the EARLY interventional answer to the
#      unseen Top-10 question (next-1), ~20 min
#   3. fidelity-3 full protocol from the committed 915k warm state (next-2)
#   4. f4 REFERENCE-SIZE Top-K: 10k targets / K=10 / 1000-step — the
#      headline at full protocol size (next-1 + next-5), ~85 min
#   5. n-free elucidator quantification (next-7)
#   6. whole-block kernel hardware validation + pallas bench (next-4)
#   7. bench.py + f4 K=1 full-metric suite + train-MFU probes (as time
#      allows; the driver reruns bench.py at round end regardless)
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
FC="${FC:-38}"
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

# 2. f4 Top-K 2k: the early interventional readout (unseen Top-10)
run_job f4_topk_2k env EVAL_CKPT="$FC" EVAL_SAMPLES=2000 EVAL_STEPS=1000 \
  EVAL_CANDIDATES=10 EVAL_SUB_GEOMETRY=0 EVAL_SAVE_MOLS=false \
  TRAIN_OVERRIDES="$EV" timeout 7200 python tools/tpu_eval_10k.py

# 3. fidelity-3 full protocol (VERDICT next-2) from the committed 915k state
run_job f3_rehydrate env WARM=/root/repo/artifacts/warm_qm9s_f3.npz \
  WORKDIR=/root/repo/exp/quality_f3 \
  TRAIN_OVERRIDES="data.synthetic_fidelity=3,data.synthetic_cache='data/synthetic_cache'" \
  timeout 1800 python tools/warm_to_ckpt.py
F3EV="data.synthetic_fidelity=3,data.synthetic_cache='data/synthetic_cache'"
run_job f3_topk_2k env TRAIN_WORKDIR=/root/repo/exp/quality_f3 \
  QUALITY_DATA_SIZE=32768 EVAL_CKPT=36 EVAL_SAMPLES=2000 EVAL_STEPS=1000 \
  EVAL_CANDIDATES=10 EVAL_SUB_GEOMETRY=0 EVAL_SAVE_MOLS=false \
  TRAIN_OVERRIDES="$F3EV" timeout 7200 python tools/tpu_eval_10k.py

# 4. f4 reference-size Top-K protocol: 10k targets x 10 candidates x
# 1000 ancestral steps = 100k reverse diffusions (~75 min at 23.5 mols/s)
run_job f4_topk_10k env EVAL_CKPT="$FC" EVAL_SAMPLES=10000 EVAL_STEPS=1000 \
  EVAL_CANDIDATES=10 EVAL_SUB_GEOMETRY=0 EVAL_SAVE_MOLS=false \
  TRAIN_OVERRIDES="$EV" timeout 14400 python tools/tpu_eval_10k.py

# 5. n-free elucidator quantification on the f4 final state
run_job nfree_eval env WARM=/root/repo/artifacts/warm_qm9s_f4.npz \
  SIZE=131072 FIDELITY=4 NT=512 STEPS=100 METHOD=dpm_solver_sde \
  OUT="$LOGD/nfree_eval.json" timeout 7200 python tools/nfree_eval.py

# 6. whole-block kernel on hardware: parity + chain timing, then the bench
# sweep with the kernel dispatched
run_job diag_block env DIAG_BATCH=32 timeout 3000 python tools/diag_block.py
run_job bench_block env BENCH_PALLAS=1 BENCH_PALLAS_OPS=block \
  timeout 3600 python bench.py

# 7. remaining value as wall clock allows
run_job bench timeout 3600 python bench.py
run_job f3_eval_2k env TRAIN_WORKDIR=/root/repo/exp/quality_f3 \
  QUALITY_DATA_SIZE=32768 EVAL_CKPT=36 EVAL_SAMPLES=2000 EVAL_STEPS=1000 \
  TRAIN_OVERRIDES="$F3EV" timeout 7200 python tools/tpu_eval_10k.py
run_job f4_eval_10k env EVAL_CKPT="$FC" EVAL_SAMPLES=10000 EVAL_STEPS=1000 \
  TRAIN_OVERRIDES="$EV" timeout 7200 python tools/tpu_eval_10k.py
run_job train_mfu timeout 3600 python tools/train_mfu.py
run_job train_mfu_sfbf16 env \
  TRAIN_OVERRIDES="model.specformer_bf16=True" \
  timeout 3600 python tools/train_mfu.py

echo "$(date '+%F %T') r4-eval: ALL JOBS DONE"
