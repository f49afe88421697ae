#!/bin/bash
# Round-5 master queue, run behind the allspectra campaign
# (tools/r5_allspectra.sh, pid in /tmp/r5_as.pid). Value-density order per
# VERDICT r5:
#   1. backward-bandwidth probe matrix under rbg (next-5) — decides the
#      f4 continuation's train config
#   2. bench.py with the hardened roofline probe (next-4)
#   3. fidelity-4 continuation to the crossing (next-2): train to the
#      wall-clock deadline with periodic warm export
#   4. f4 Top-K 2k (crossing readout) + the 10k-target K=10 headline
#      protocol (next-3)
#   5. atom-count head training + n-free eval protocol C (next-6)
#   6. ring geometry sampler sweep (next-7) as time allows
#
# Env: R5_DEADLINE_EPOCH — hard stop for the f4 train phase (default
# now+2h). Each job logs under tools/pipeline_logs/r5/ with a DONE marker.
set -u
cd "$(dirname "$0")/.."
LOGD=tools/pipeline_logs/r5
mkdir -p "$LOGD"

as_pid=$(cat /tmp/r5_as.pid 2>/dev/null || echo "")
if [ -n "$as_pid" ]; then
  echo "$(date '+%F %T') r5: waiting on allspectra pid $as_pid"
  while kill -0 "$as_pid" 2>/dev/null; do sleep 60; done
fi
echo "$(date '+%F %T') r5: allspectra phase done"

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

# ---- 1+2: probe window between campaigns -----------------------------
run_job bwd_probes bash tools/r5_bwd_probes.sh "$LOGD"
run_job bench timeout 3600 python bench.py

# ---- 3: fidelity-4 continuation --------------------------------------
export TRAIN_WORKDIR=/root/repo/exp/quality_f4
export QUALITY_DATA_SIZE=131072
EV="data.synthetic_fidelity=4,data.synthetic_cache='data/synthetic_cache'"
TRAIN_OVR="data.bucket_sizes=(17,21,25,29),$EV"
# extra overrides decided by the probe matrix land here via a marker file
if [ -f "$LOGD/train_extra_ovr" ]; then
  TRAIN_OVR="$TRAIN_OVR,$(cat "$LOGD/train_extra_ovr")"
fi
WARM=/root/repo/artifacts/warm_qm9s_f4.npz
BASE_STEP=$(python - "$WARM" <<'EOF'
import sys, numpy as np
print(int(np.load(sys.argv[1])["raw:step"]))
EOF
)
now=$(date +%s)
deadline="${R5_DEADLINE_EPOCH:-$((now + 7200))}"
# conservative 75 ms/step bucketed planning rate
target=$(( BASE_STEP + (deadline - now) * 1000 / 75 ))
target=$(( target / 5000 * 5000 ))
min_target=$(( BASE_STEP + 25000 ))
[ "$target" -lt "$min_target" ] && target=$min_target
echo "$(date '+%F %T') r5: f4 continue $BASE_STEP -> $target"

TRAIN_WORKDIR=/root/repo/exp/quality_f4 \
QUALITY_STEPS=$target \
QUALITY_SNAPSHOT=25000 \
QUALITY_WARM_START="$WARM" \
QUALITY_LOG=tools/train_quality_f4r5.log \
WATCHDOG_MAX_RESTARTS=20 WATCHDOG_STALL_SECS=1200 WATCHDOG_COMPILE_GRACE=5400 \
TRAIN_OVERRIDES="$TRAIN_OVR" \
  python tools/run_with_watchdog.py tools/train_quality_f4r5.log \
  python tools/tpu_quality_run.py > "$LOGD/f4_watchdog.out" 2>&1 &
echo $! > /tmp/watchdog.pid
WARM_OUT="$WARM" EVAL_OVERRIDES="$EV" WARM_EXPORT_INTERVAL=2400 \
  bash tools/periodic_warm_export.sh > /tmp/warm_export_loop.log 2>&1 &
wait "$(cat /tmp/watchdog.pid)"
f4rc=$?
echo "$(date '+%F %T') r5: f4 train done rc=$f4rc; last steps:"
grep -aE "step: " tools/train_quality_f4r5.log | tail -2

# ---- 4: persist + eval ------------------------------------------------
run_job export_warm_f4 env WARM_OUT="$WARM" TRAIN_OVERRIDES="$EV" \
  timeout 1800 python tools/export_warm_state.py
git -C /root/repo add -- artifacts/warm_qm9s_f4.npz
git -C /root/repo commit -m \
  "Fidelity-4 continuation warm state (r5 campaign export)" \
  -- artifacts/warm_qm9s_f4.npz || true

FC=$(ls -d "$TRAIN_WORKDIR"/checkpoints/checkpoint_* 2>/dev/null \
  | sed 's/.*checkpoint_//' | grep -x '[0-9][0-9]*' | sort -n | tail -1)
echo "r5: final checkpoint $FC"

run_job f4_topk_2k env EVAL_CKPT="$FC" EVAL_SAMPLES=2000 EVAL_STEPS=1000 \
  EVAL_CANDIDATES=10 EVAL_SUB_GEOMETRY=0 EVAL_SAVE_MOLS=false \
  TRAIN_OVERRIDES="$EV" timeout 7200 python tools/tpu_eval_10k.py

run_job f4_topk_10k env EVAL_CKPT="$FC" EVAL_SAMPLES=10000 EVAL_STEPS=1000 \
  EVAL_CANDIDATES=10 EVAL_SUB_GEOMETRY=0 EVAL_SAVE_MOLS=false \
  TRAIN_OVERRIDES="$EV" timeout 14400 python tools/tpu_eval_10k.py

# ---- 5: atom-count head + n-free protocol C ---------------------------
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

# ---- 6: ring geometry sweep (as time allows) --------------------------
run_job ring_geo bash tools/r5_ring_geo.sh "$LOGD"

echo "$(date '+%F %T') r5: ALL JOBS DONE"
