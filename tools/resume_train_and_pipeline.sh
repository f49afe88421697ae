#!/bin/bash
# Resume the quality run once the TPU backend responds, then run the
# post-training chip-job pipeline (tools/session_pipeline.sh).
#
# Exists because the TPU relay in this environment has multi-minute to
# multi-hour outages (tools/run_with_watchdog.py docstring): probing first
# is cheaper than burning watchdog compile-grace windows on a dead backend.
#
# The step target adapts to the remaining wall clock: the longer the outage,
# the lower the target, so the eval pipeline always gets its ~2.5h budget.
# TRAIN_DEADLINE_EPOCH (secs) caps when training must END; default is set by
# the launcher for the current session.
set -u
cd "$(dirname "$0")/.."

# Campaign parameters (env-overridable; defaults = the original v1 run)
export TRAIN_WORKDIR="${TRAIN_WORKDIR:-/root/repo/exp/quality_run}"
export QUALITY_DATA_SIZE="${QUALITY_DATA_SIZE:-32768}"
# overrides shared by train/eval/export (dataset identity); perf probes
# in the pipeline deliberately don't see them
export EVAL_OVERRIDES="${EVAL_OVERRIDES:-}"
# NB: ${EVAL_OVERRIDES:+,...} — a bare trailing comma would make
# ast.literal_eval parse 'data.bucket_sizes=(17,21,25,29),' as a nested
# tuple and crash every training start
TRAIN_OVR="${TRAIN_OVR:-data.bucket_sizes=(17,21,25,29)${EVAL_OVERRIDES:+,$EVAL_OVERRIDES}}"
export PIPE_TAG="${PIPE_TAG:-$(basename "$TRAIN_WORKDIR")}"
# per-campaign step log: the watchdog's stall detector and the RESUME_STEP
# estimate below must not read another campaign's step lines
export QUALITY_LOG="${QUALITY_LOG:-tools/train_$(basename "$TRAIN_WORKDIR").log}"

echo "$(date '+%F %T') resume: probing TPU backend"
until timeout 300 python tools/tpu_probe.py; do
  echo "$(date '+%F %T') resume: TPU unavailable, retrying in 180s"
  sleep 180
done

# adaptive step target: resume point + steps that fit before the deadline.
# 90ms/step estimate: bucketed train padding is adopted below (static was
# 99ms wall; pair-grid compute scales ~N^2 and buckets [17,21,25,29] track
# the QM9 atom-count histogram, so the mix should land well under 99ms —
# the bucketed *sampling* sweep won 62.6->78.6 mols/s the same way).
# Warm start: if the repo carries an exported warm state (artifacts/*.npz,
# written by tools/export_warm_state.py and committed), hand it to the
# trainer UNCONDITIONALLY — run_lib only consumes it when the workdir has
# no restorable checkpoint of its own (a real resume always wins), so this
# is a pure fallback. Do NOT gate on the checkpoints directory: run_lib
# creates that directory at startup, so after any early crash it exists
# even though nothing restorable was ever written.
WARM_NPZ="${WARM_NPZ:-/root/repo/artifacts/warm_qm9s_ir.npz}"
[ -f "$WARM_NPZ" ] && export QUALITY_WARM_START="$WARM_NPZ"

# RESUME_STEP feeds only the step-target estimate. Best available signal:
# the last step line the previous run logged; else the warm npz's step;
# else a genuine fresh start at 0.
if [ -z "${RESUME_STEP:-}" ]; then
  if [ -d "$TRAIN_WORKDIR/checkpoints-meta/checkpoint" ]; then
    # per-campaign log first; the legacy shared quality_run.log only as a
    # fallback for pre-split campaigns (never across campaigns)
    RESUME_STEP=$(grep -oa "step: [0-9]*" "$QUALITY_LOG" 2>/dev/null \
      | tail -1 | grep -o "[0-9]*$")
    if [ -z "${RESUME_STEP:-}" ] && \
       [ "$TRAIN_WORKDIR" = "/root/repo/exp/quality_run" ]; then
      RESUME_STEP=$(grep -oa "step: [0-9]*" tools/quality_run.log 2>/dev/null \
        | tail -1 | grep -o "[0-9]*$")
    fi
    [ -n "${RESUME_STEP:-}" ] && \
      echo "$(date '+%F %T') resume: workdir checkpoint, last logged step $RESUME_STEP"
  fi
  if [ -z "${RESUME_STEP:-}" ] && [ -f "$WARM_NPZ" ]; then
    RESUME_STEP=$(python - "$WARM_NPZ" <<'EOF'
import sys, numpy as np
print(int(np.load(sys.argv[1])["raw:step"]))
EOF
)
    echo "$(date '+%F %T') resume: warm start from $WARM_NPZ at step $RESUME_STEP"
  fi
  if [ -z "${RESUME_STEP:-}" ]; then
    RESUME_STEP=0
    echo "$(date '+%F %T') resume: fresh start (no checkpoint, no warm state)"
  fi
fi
MAX_STEPS="${MAX_STEPS:-500000}"
# floor relative to the resume point (at least one more numbered 25k
# checkpoint) — an absolute floor would force an unreachable target after
# a low-step restart and starve the eval pipeline of its wall-clock budget
MIN_STEPS="${MIN_STEPS:-$(( RESUME_STEP + 25000 ))}"
now=$(date +%s)
deadline="${TRAIN_DEADLINE_EPOCH:-$((now + 21600))}"
fit=$(( RESUME_STEP + (deadline - now) * 1000 / 90 ))
target=$fit
[ "$target" -gt "$MAX_STEPS" ] && target=$MAX_STEPS
[ "$target" -lt "$MIN_STEPS" ] && target=$MIN_STEPS
# align to the 25k snapshot cadence so the last checkpoint is numbered
target=$(( target / 25000 * 25000 ))
final_ckpt=$(( target / 25000 ))
echo "$(date '+%F %T') resume: TPU healthy; step target $target (ckpt $final_ckpt)"

# Bucketed train padding (first hardware adoption): the single-chip device
# store path compiles one program per bucket n_pad (run_lib.py store_step
# static n_pad) — a few extra remote compiles up front, then every batch
# runs at its bucket's true size instead of the static N=29. Monitored
# after launch: if graphs/sec regresses vs the 1298 static baseline, kill
# the watchdog, drop TRAIN_OVERRIDES, and relaunch.
# Bucketed training compiles one train program per bucket LAZILY (as each
# n_pad first appears) through the remote compile service (40s-12min each,
# cache cold after this session's model edits):
# - WATCHDOG_STALL_SECS=1200: step lines legitimately pause for up to
#   ~12min between later bucket compiles — the default 300s stall timer
#   would misread that as a wedge and kill mid-compile.
# - WATCHDOG_COMPILE_GRACE=5400: with log_freq=500 the FIRST step line can
#   land only after several bucket compiles (worst case ~4 x 12min) plus
#   restore + store upload — the default 45min grace could SIGTERM a
#   healthy child mid-first-compile.
QUALITY_STEPS="$target" WATCHDOG_MAX_RESTARTS=40 WATCHDOG_STALL_SECS=1200 \
  WATCHDOG_COMPILE_GRACE=5400 \
  TRAIN_OVERRIDES="$TRAIN_OVR" \
  python tools/run_with_watchdog.py "$QUALITY_LOG" \
  python tools/tpu_quality_run.py > /tmp/watchdog.out 2>&1 &
echo $! > /tmp/watchdog.pid
echo "$(date '+%F %T') resume: watchdog pid $(cat /tmp/watchdog.pid)"

# periodic warm-state export: persists the campaign into the repository
# every hour while training runs (tools/periodic_warm_export.sh docstring —
# a machine switch must never again cost 300k steps)
bash tools/periodic_warm_export.sh > /tmp/warm_export_loop.log 2>&1 &
echo $! > /tmp/warm_export.pid
echo "$(date '+%F %T') resume: warm-export loop pid $(cat /tmp/warm_export.pid)"

FINAL_CKPT="$final_ckpt" bash tools/session_pipeline.sh
