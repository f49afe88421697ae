#!/bin/bash
# Post-training chip-job pipeline for the extended quality run.
#
# Waits for the watchdog-managed 500k-step training (tools/tpu_quality_run.py
# under tools/run_with_watchdog.py, pid in /tmp/watchdog.pid) to finish, then
# runs the remaining single-chip jobs in value order:
#   1. full 10k/1000-step eval at the final checkpoint (step 500k = ckpt 20)
#   2. Top-K protocol (10 candidates, 2k targets, DPM-Solver++ 100 steps)
#   3. bench.py (north-star JSON line)
#   4. intermediate-checkpoint evals to extend the budget-scaling table
# Each job logs under tools/pipeline_logs/. Idempotent-ish: jobs whose log
# already ends in DONE are skipped, so the pipeline can be relaunched.
set -u
cd "$(dirname "$0")/.."
export TRAIN_WORKDIR="${TRAIN_WORKDIR:-/root/repo/exp/quality_run}"
# PIPE_TAG: subdirectory for this campaign's job logs (so a new campaign's
# jobs don't get skipped by a previous campaign's DONE markers). Default:
# the campaign workdir's name — NOT the shared root, whose committed DONE
# markers from an earlier campaign would silently skip the final eval and
# warm-state export after further training.
PIPE_TAG="${PIPE_TAG:-$(basename "$TRAIN_WORKDIR")}"
LOGDIR="tools/pipeline_logs/$PIPE_TAG"
mkdir -p "$LOGDIR"

wd_pid=$(cat /tmp/watchdog.pid 2>/dev/null || echo "")
if [ -n "$wd_pid" ]; then
  echo "pipeline: waiting on watchdog pid $wd_pid"
  while kill -0 "$wd_pid" 2>/dev/null; do sleep 60; done
fi
echo "pipeline: training watchdog exited; starting eval jobs"

run_job() {
  local name="$1"; shift
  local log="$LOGDIR/${name}.log"
  if [ -f "$log" ] && tail -1 "$log" | grep -q "^DONE rc=0"; then
    echo "pipeline: $name already DONE, skipping"
    return 0
  fi
  echo "pipeline: running $name"
  "$@" > "$log" 2>&1
  local rc=$?
  echo "DONE rc=$rc" >> "$log"
  echo "pipeline: $name finished rc=$rc"
}

export QUALITY_DATA_SIZE="${QUALITY_DATA_SIZE:-32768}"
# data-config overrides the CAMPAIGN trained with (synthetic_fidelity,
# synthetic_cache, ...): eval/export jobs must see them so they read the
# same dataset; perf probes must NOT (they measure fixed protocols), so
# this is passed per-job rather than exported
EV="${EVAL_OVERRIDES:-}"

# FINAL_CKPT: number of the last numbered checkpoint the (possibly
# outage-shortened) training produced — set by resume_train_and_pipeline.sh
FC="${FINAL_CKPT:-20}"
# The launcher's plan can overshoot reality (backend outages or a crash-loop
# can cut training short of its step target): trust the filesystem — use the
# highest numbered checkpoint that actually exists.
# NOTE: filter to purely numeric names — a SIGKILL mid-save leaves orbax
# tmp dirs like checkpoint_13.orbax-checkpoint-tmp-<ts> that would win the
# numeric sort with a non-numeric value (same guard as
# diffspectra_tpu/checkpoint.py latest_numbered_checkpoint)
actual_fc=$(ls -d "$TRAIN_WORKDIR"/checkpoints/checkpoint_* 2>/dev/null \
  | sed 's/.*checkpoint_//' | grep -x '[0-9][0-9]*' | sort -n | tail -1)
if [ -n "$actual_fc" ] && [ "$actual_fc" != "$FC" ]; then
  echo "pipeline: planned final ckpt $FC, actual on disk $actual_fc — using actual"
  FC="$actual_fc"
fi

# 0. persist the trained weights into the repository (the exp/ scratch disk
# does not survive across build machines; the bf16 warm state does)
run_job export_warm_state env TRAIN_OVERRIDES="$EV" \
  timeout 1800 python tools/export_warm_state.py
if [ -f /root/repo/artifacts/warm_qm9s_ir.npz ]; then
  # pathspec-scoped add/commit (as in periodic_warm_export.sh): never sweep
  # unrelated staged files into the weights commit
  git -C /root/repo add -- artifacts/warm_qm9s_ir.npz
  git -C /root/repo commit -m \
    "Update trained warm-state weights from the quality run" \
    -- artifacts/warm_qm9s_ir.npz || true
fi

# Per-job timeouts: eval jobs run without the training watchdog, and the
# TPU transport can wedge mid-run — a hung job must not eat the session.

# 1. final checkpoint, reference protocol (10k mols / 1000 ancestral steps)
run_job eval_ckpt_final env EVAL_CKPT="$FC" EVAL_SAMPLES=10000 EVAL_STEPS=1000 \
  TRAIN_OVERRIDES="$EV" timeout 7200 python tools/tpu_eval_10k.py

# 2. Top-K protocol at the final checkpoint (Top-1/Top-10 headline).
# SDE variant: measured +4.4pt 2D Top-1 over the ODE solver at the same
# 100-step cost (RESULTS.md, v2 eval_dpm_sde probe) — the better fast default.
run_job topk_ckpt_final env EVAL_CKPT="$FC" EVAL_SAMPLES=2000 EVAL_STEPS=100 \
  EVAL_METHOD=dpm_solver_sde EVAL_CANDIDATES=10 EVAL_SUB_GEOMETRY=0 \
  EVAL_SAVE_MOLS=false TRAIN_OVERRIDES="$EV" \
  timeout 5400 python tools/tpu_eval_10k.py

# 2b. Top-K under the full reference protocol (1000 ancestral steps — the
# number directly comparable to the reference's Top-10 headline; ~17 min
# at the measured 20 mols/s production sweep)
run_job topk_ancestral_final env EVAL_CKPT="$FC" EVAL_SAMPLES=2000 \
  EVAL_STEPS=1000 EVAL_CANDIDATES=10 EVAL_SUB_GEOMETRY=0 \
  EVAL_SAVE_MOLS=false TRAIN_OVERRIDES="$EV" \
  timeout 7200 python tools/tpu_eval_10k.py

# 3. bench (north-star metric)
run_job bench timeout 3600 python bench.py

# 4. intermediate checkpoints for the budget-scaling table
for ck in ${MID_CKPTS:-12 16}; do
  [ "$ck" -ge "$FC" ] && continue
  [ -d "$TRAIN_WORKDIR/checkpoints/checkpoint_$ck" ] || continue
  run_job "eval_ckpt$ck" env EVAL_CKPT="$ck" EVAL_SAMPLES=10000 EVAL_STEPS=1000 \
    EVAL_SUB_GEOMETRY=0 EVAL_SAVE_MOLS=false TRAIN_OVERRIDES="$EV" \
    timeout 5400 python tools/tpu_eval_10k.py
done

# 5. perf probes (ROADMAP item 5 / VERDICT r1 #6): the untested levers.
# 5a. static-padding baseline re-probe: training now runs bucketed and the
# attention layer merged its two edge_attr gate reads into one matmul —
# this re-measures the static-N=29 step so the w01-merge effect is
# separable from bucketing (prior static baseline: 99ms / 1290 graphs/sec)
rm -rf /root/repo/exp/probe_static
run_job probe_static_baseline env TRAIN_WORKDIR=/root/repo/exp/probe_static \
  TRAIN_STEPS=300 timeout 3600 python tools/tpu_train_smoke.py

# remat_policy='none' trades HBM for the backward recompute of the block
# scan — the one step-time knob added last session but never measured.
rm -rf /root/repo/exp/probe_remat
run_job probe_remat_none env TRAIN_WORKDIR=/root/repo/exp/probe_remat \
  TRAIN_STEPS=300 TRAIN_OVERRIDES="model.remat_policy='none'" \
  timeout 3600 python tools/tpu_train_smoke.py

# 6. sampling-batch scaling probe for the north-star metric
run_job bench_b256 env BENCH_BATCH=256 BENCH_SAMPLES=2560 timeout 5400 python bench.py

# 7. bucketed-padding train-step probe: bucket_sizes are now first-class on
# every store path (incl. the mesh device store); pair-grid compute scales
# ~N^2 and the QM9 mean is 18 atoms vs the static N=29, so homogeneous
# buckets should cut real step time — measure before adopting in training
rm -rf /root/repo/exp/probe_buckets
run_job probe_train_buckets env TRAIN_WORKDIR=/root/repo/exp/probe_buckets \
  TRAIN_STEPS=300 TRAIN_OVERRIDES="data.bucket_sizes=(17,21,25,29)" \
  timeout 3600 python tools/tpu_train_smoke.py

# 7b. SDE-DPM-Solver++ vs ODE at 100 steps: does per-step noise re-injection
# recover the 3D validity the deterministic solver loses (0.69 ancestral ->
# 0.65 ODE at 100 steps, RESULTS.md)?
run_job eval_dpm_sde env EVAL_CKPT="$FC" EVAL_SAMPLES=2048 EVAL_STEPS=100 \
  EVAL_METHOD=dpm_solver_sde EVAL_SUB_GEOMETRY=0 EVAL_SAVE_MOLS=false \
  TRAIN_OVERRIDES="$EV" timeout 3600 python tools/tpu_eval_10k.py

# 8. SpecFormer masked-patch pretrain -> fine-tune delta (ROADMAP item 8,
# first hardware exercise): pretrain the spectra encoder, then compare two
# short fine-tunes (scratch vs pretrained init) on loss tail + snapshot
run_job pretrain_specformer timeout 2400 \
  python -m diffspectra_tpu.main \
  --config diffspectra_tpu/configs/diffspectra_qm9s.py \
  --workdir /root/repo/exp/probe_pretrain --mode pretrain \
  --config.data.spectra_version=ir --config.data.synthetic=True \
  --config.pretrain.n_iters=3000 --config.pretrain.warmup=300 \
  --config.pretrain.log_freq=100 --config.pretrain.snapshot_freq=3000
rm -rf /root/repo/exp/probe_ft_scratch /root/repo/exp/probe_ft_pre
run_job finetune_scratch env TRAIN_WORKDIR=/root/repo/exp/probe_ft_scratch \
  TRAIN_STEPS=10000 timeout 3600 python tools/tpu_train_smoke.py
run_job finetune_pretrained env TRAIN_WORKDIR=/root/repo/exp/probe_ft_pre \
  TRAIN_STEPS=10000 \
  TRAIN_OVERRIDES="model.pretrained_specformer_path='/root/repo/exp/probe_pretrain/specformer_pretrained.npz'" \
  timeout 3600 python tools/tpu_train_smoke.py

# 9. known-crashy recompile checks LAST (both have crashed the remote
# compile helper in past sessions; keep them from poisoning earlier jobs)
run_job probe_mosaic timeout 1200 python tools/diag_pallas.py
rm -rf /root/repo/exp/probe_sf_bf16
run_job probe_sf_bf16 env TRAIN_WORKDIR=/root/repo/exp/probe_sf_bf16 \
  TRAIN_STEPS=100 TRAIN_OVERRIDES="model.specformer_bf16=True" \
  timeout 2400 python tools/tpu_train_smoke.py

echo "pipeline: all jobs complete"
