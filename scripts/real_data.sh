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

# 1. train (reference budget: 2M steps / #devices, batch 128 x #devices —
#    resolve_runtime_config scales both by the local device count)
python -m diffspectra_tpu.main --config $CFG --workdir "$WORKDIR" --mode train \
    --config.data.spectra_version "$SPECTRA"

# 2. full evaluation at the reference's checkpoint (10k molecules, 1000
#    ancestral steps, complete metric suite incl. Top-K structure recovery)
python -m diffspectra_tpu.main --config $CFG --workdir "$WORKDIR" --mode eval \
    --config.data.spectra_version "$SPECTRA" \
    --config.eval.ckpts 40 --config.eval.num_candidates 10
