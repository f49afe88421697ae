#!/usr/bin/env bash
# One-command real-data entry: processed QM9S .pt -> packed store -> train
# -> full eval (the reference's headline protocol, ref README.md:104-118).
#
# Prerequisites: place the reference's processed dataset under
#   data/QM9S/processed/data_qm9_allspectra.pt        (required)
#   data/QM9S/split_dict_diffspectra_qm9.pt           (conditional split;
#                                                      optional, seeded
#                                                      fallback otherwise)
# The first run auto-converts the .pt into the dense packed store
# (data/QM9S/packed/*.npy, diffspectra_tpu/data/qm9s.py:pack_from_pyg) and
# every later run memory-maps the packed arrays directly. The conversion and
# the trainer are fixture-tested end-to-end in tests/test_qm9s_ingest.py.
set -e
CFG=diffspectra_tpu/configs/diffspectra_qm9s.py
WORKDIR=${WORKDIR:-exp/qm9s_real}
SPECTRA=${SPECTRA:-allspectra}
# DATA_ROOT: where the processed/packed dataset lives (default data/QM9S).
# TRAIN_FLAGS / EVAL_FLAGS: extra dotted-config overrides appended to the
# respective invocation — used by the at-scale rehearsal
# (tools/make_rehearsal_pt.py + a short n_iters) and by partial reruns.
# EVAL_CKPT: checkpoint number to evaluate (reference protocol: 40).
DATA_ROOT=${DATA_ROOT:-data/QM9S}
EVAL_CKPT=${EVAL_CKPT:-40}

# 1. train (reference budget: 2M steps / #devices, batch 128 x #devices —
#    resolve_runtime_config scales both by the local device count)
python -m diffspectra_tpu.main --config $CFG --workdir "$WORKDIR" --mode train \
    --config.data.spectra_version "$SPECTRA" \
    --config.data.root "$DATA_ROOT" ${TRAIN_FLAGS:-}

# 2. full evaluation at the reference's checkpoint (10k molecules, 1000
#    ancestral steps, complete metric suite incl. Top-K structure recovery)
python -m diffspectra_tpu.main --config $CFG --workdir "$WORKDIR" --mode eval \
    --config.data.spectra_version "$SPECTRA" \
    --config.data.root "$DATA_ROOT" \
    --config.eval.ckpts "$EVAL_CKPT" --config.eval.num_candidates 10 ${EVAL_FLAGS:-}
