#!/usr/bin/env bash
# Training recipes mirroring ref scripts/training_scripts.sh: the five
# spectra modes (ir / raman / uv / allspectra / allspectra + pretrained
# SpecFormer). Device selection is governed by the jax runtime (all local
# TPU chips are used for data parallelism).

set -e
CFG=diffspectra_tpu/configs/diffspectra_qm9s.py

# IR only
python -m diffspectra_tpu.main --config $CFG --workdir exp/ir --mode train \
    --config.data.spectra_version ir

# Raman only
python -m diffspectra_tpu.main --config $CFG --workdir exp/raman --mode train \
    --config.data.spectra_version raman

# UV-Vis only
python -m diffspectra_tpu.main --config $CFG --workdir exp/uv --mode train \
    --config.data.spectra_version uv

# All spectra
python -m diffspectra_tpu.main --config $CFG --workdir exp/allspectra --mode train \
    --config.data.spectra_version allspectra

# All spectra with pretrained SpecFormer
python -m diffspectra_tpu.main --config $CFG \
    --workdir exp/allspectra_pretrained_specformer --mode train \
    --config.data.spectra_version allspectra \
    --config.model.pretrained_specformer_path exp/pretrained_specformer.ckpt

# SpecFormer masked-patch pretraining (TPU-native addition; produces the
# checkpoint the allspectra_pretrained recipe consumes)
python -m diffspectra_tpu.main --config $CFG --workdir exp/pretrain_specformer \
    --mode pretrain --config.data.spectra_version allspectra
