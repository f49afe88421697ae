#!/bin/bash
# Periodically persist the in-flight training campaign into the repository.
#
# Motivation (learned the hard way): the scratch disk holding exp/ does NOT
# survive across build machines, and a 305k-step campaign was lost because
# the warm-state export only ran at the END of the session pipeline. This
# loop exports the latest preemption checkpoint as the compact bf16 warm
# state (tools/export_warm_state.py, ~20 MB) and commits it every
# WARM_EXPORT_INTERVAL seconds (default 3600 — a lost hour of training is
# recoverable; a bloated git history is not), so any later session on any
# machine can continue the campaign from the repository alone.
#
# Runs alongside the training watchdog and exits when it does; the export
# itself uses the CPU backend (export_warm_state.py sets JAX_PLATFORMS=cpu)
# so it never competes for the TPU. Orbax saves are atomic (tmp + rename),
# so restoring the latest checkpoint mid-training is safe; a transient
# failure just skips one interval.
set -u
cd "$(dirname "$0")/.."

INTERVAL="${WARM_EXPORT_INTERVAL:-3600}"
OUT="${WARM_OUT:-/root/repo/artifacts/warm_qm9s_ir.npz}"
WD="${TRAIN_WORKDIR:-/root/repo/exp/quality_run}"
REL="${OUT#/root/repo/}"
LAST_STEP="-1"

while true; do
  sleep "$INTERVAL"
  wd_pid=$(cat /tmp/watchdog.pid 2>/dev/null || echo "")
  if [ -z "$wd_pid" ] || ! kill -0 "$wd_pid" 2>/dev/null; then
    echo "$(date '+%F %T') warm-export: watchdog gone, exiting"
    exit 0
  fi
  [ -d "$WD/checkpoints" ] || continue
  if ! WARM_OUT="$OUT" TRAIN_WORKDIR="$WD" \
      TRAIN_OVERRIDES="${EVAL_OVERRIDES:-}" timeout 1500 \
      python tools/export_warm_state.py > /tmp/warm_export.log 2>&1; then
    echo "$(date '+%F %T') warm-export: export failed (see /tmp/warm_export.log)"
    continue
  fi
  step=$(python - "$OUT" <<'EOF'
import sys, numpy as np
print(int(np.load(sys.argv[1])["raw:step"]))
EOF
)
  if [ "$step" != "$LAST_STEP" ]; then
    LAST_STEP="$step"
    # pathspec-style commit: records the working-tree content of OUT only,
    # without touching whatever the interactive session has staged
    git -C /root/repo add -- "$REL" 2>/dev/null || true
    git -C /root/repo commit -m \
      "Warm-state snapshot at step $step (periodic in-training export)" \
      -- "$REL" >/dev/null 2>&1 || true
    echo "$(date '+%F %T') warm-export: committed step $step"
  fi
done
