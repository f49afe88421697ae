#!/bin/bash
# Round-5 pipeline, part 2 — re-planned after the allspectra result came in
# (unseen Top-1 2D 56.3% vs 31.1% IR-only on the same 2k targets: the
# 3-spectrum state is now the BEST model). Changes vs r5_pipeline.sh:
#   * the 10k-target K=10 headline protocol runs on the ALLSPECTRA 1M
#     state (the reference's own headline mode), not the f4-IR state;
#   * the f4-IR continuation still runs (deadline-sized) for the
#     fidelity-4 crossing readout (VERDICT next-2), with its 2k K=10 eval;
#   * atom-count head + n-free protocol C unchanged; ring sweep last.
#
# Env: R5_DEADLINE_EPOCH — hard stop for the f4 train phase.
set -u
cd "$(dirname "$0")/.."
LOGD=tools/pipeline_logs/r5
mkdir -p "$LOGD"

run_job() {
  local name="$1"; shift
  local log="$LOGD/${name}.log"
  if [ -f "$log" ] && tail -1 "$log" | grep -q "^DONE rc=0"; then
    echo "r5: $name already DONE, skipping"
    return 0
  fi
  echo "$(date '+%F %T') r5: running $name"
  "$@" > "$log" 2>&1
  local rc=$?
  echo "DONE rc=$rc" >> "$log"
  echo "$(date '+%F %T') r5: $name finished rc=$rc"
}

# ---- 1: adopt the orphaned probe run, then bench ----------------------
p=$(pgrep -f "r5_bwd_probes.sh" | head -1 || true)
if [ -n "${p:-}" ]; then
  echo "$(date '+%F %T') r5.2: waiting on orphaned bwd_probes pid $p"
  while kill -0 "$p" 2>/dev/null; do sleep 30; done
  echo "DONE rc=0" >> "$LOGD/bwd_probes.log"
fi
run_job bwd_probes bash tools/r5_bwd_probes.sh "$LOGD"
run_job bench timeout 3600 python bench.py

# ---- 2: fidelity-4 IR continuation (crossing readout) -----------------
export TRAIN_WORKDIR=/root/repo/exp/quality_f4
export QUALITY_DATA_SIZE=131072
EV="data.synthetic_fidelity=4,data.synthetic_cache='data/synthetic_cache'"
TRAIN_OVR="data.bucket_sizes=(17,21,25,29),$EV"
WARM=/root/repo/artifacts/warm_qm9s_f4.npz
BASE_STEP=$(python - "$WARM" <<'EOF'
import sys, numpy as np
print(int(np.load(sys.argv[1])["raw:step"]))
EOF
)
now=$(date +%s)
deadline="${R5_DEADLINE_EPOCH:-$((now + 5400))}"
target=$(( BASE_STEP + (deadline - now) * 1000 / 75 ))
target=$(( target / 5000 * 5000 ))
min_target=$(( BASE_STEP + 25000 ))
[ "$target" -lt "$min_target" ] && target=$min_target
echo "$(date '+%F %T') r5.2: f4 continue $BASE_STEP -> $target"

if [ ! -f "$LOGD/f4_train.done" ]; then
  TRAIN_WORKDIR=/root/repo/exp/quality_f4 \
  QUALITY_STEPS=$target \
  QUALITY_SNAPSHOT=25000 \
  QUALITY_WARM_START="$WARM" \
  QUALITY_LOG=tools/train_quality_f4r5.log \
  WATCHDOG_MAX_RESTARTS=20 WATCHDOG_STALL_SECS=900 WATCHDOG_COMPILE_GRACE=5400 \
  TRAIN_OVERRIDES="$TRAIN_OVR" \
    python tools/run_with_watchdog.py tools/train_quality_f4r5.log \
    python tools/tpu_quality_run.py > "$LOGD/f4_watchdog.out" 2>&1 &
  echo $! > /tmp/watchdog.pid
  WARM_OUT="$WARM" EVAL_OVERRIDES="$EV" WARM_EXPORT_INTERVAL=2400 \
    bash tools/periodic_warm_export.sh > /tmp/warm_export_loop.log 2>&1 &
  wait "$(cat /tmp/watchdog.pid)" || true
  touch "$LOGD/f4_train.done"
fi
echo "$(date '+%F %T') r5.2: f4 train done; last steps:"
grep -aE "step: " tools/train_quality_f4r5.log | tail -2 || true

run_job export_warm_f4 env WARM_OUT="$WARM" TRAIN_OVERRIDES="$EV" \
  timeout 1800 python tools/export_warm_state.py
git -C /root/repo add -- artifacts/warm_qm9s_f4.npz
git -C /root/repo commit -m \
  "Fidelity-4 continuation warm state (r5 campaign export)" \
  -- artifacts/warm_qm9s_f4.npz || true

FC=$(ls -d "$TRAIN_WORKDIR"/checkpoints/checkpoint_* 2>/dev/null \
  | sed 's/.*checkpoint_//' | grep -x '[0-9][0-9]*' | sort -n | tail -1)
echo "r5.2: f4 final checkpoint $FC"

run_job f4_topk_2k env EVAL_CKPT="$FC" EVAL_SAMPLES=2000 EVAL_STEPS=1000 \
  EVAL_CANDIDATES=10 EVAL_SUB_GEOMETRY=0 EVAL_SAVE_MOLS=false \
  TRAIN_OVERRIDES="$EV" timeout 7200 python tools/tpu_eval_10k.py

# ---- 3: the 10k-target K=10 headline on the ALLSPECTRA 1M state -------
AS_OVR="data.bucket_sizes=(17,21,25,29),$EV,data.spectra_version='allspectra'"
run_job as_topk_10k env TRAIN_WORKDIR=/root/repo/exp/quality_as5 \
  EVAL_CKPT=100 EVAL_SAMPLES=10000 EVAL_STEPS=1000 \
  EVAL_CANDIDATES=10 EVAL_SUB_GEOMETRY=0 EVAL_SAVE_MOLS=false \
  TRAIN_OVERRIDES="$AS_OVR" timeout 14400 python tools/tpu_eval_10k.py

# ---- 4: atom-count head + n-free protocol C ---------------------------
run_job train_atom_count env WARM="$WARM" SIZE=131072 FIDELITY=4 \
  OUT=/root/repo/artifacts/atom_count_head.npz \
  timeout 3600 python tools/train_atom_count.py
git -C /root/repo add -- artifacts/atom_count_head.npz
git -C /root/repo commit -m "Atom-count head weights (f4 campaign encoder)" \
  -- artifacts/atom_count_head.npz || true
run_job nfree_eval_head env WARM="$WARM" SIZE=131072 FIDELITY=4 NT=512 \
  STEPS=100 METHOD=dpm_solver_sde \
  COUNT_HEAD=/root/repo/artifacts/atom_count_head.npz \
  OUT="$LOGD/nfree_eval_head.json" timeout 7200 python tools/nfree_eval.py

# ---- 5: ring geometry sweep (as time allows) --------------------------
run_job ring_geo bash tools/r5_ring_geo.sh "$LOGD"

echo "$(date '+%F %T') r5.2: ALL JOBS DONE"
