"""Auxiliary original-QM9 config (ref configs/base_qm9.py:7-121), passed as
``--config_original_qm9``. Like the reference, it is used only to load the
train/test molecules for the metric reference sets (ref run_lib.py:340-342):
``exp_type='vpsde_edge_cond'`` selects the original-QM9 split
(data/pipeline.py:_original_splits) instead of the conditional 4-way split,
so novelty / moses statistics are computed against the same distribution the
reference uses. When the flag is omitted, run_lib falls back to the
conditional-split dataset and logs the deviation."""

try:
    from . import diffspectra_qm9s
except ImportError:  # loaded standalone by ml_collections config_flags
    from diffspectra_tpu.configs import diffspectra_qm9s


def get_config():
    config = diffspectra_qm9s.get_config()
    config.exp_type = "vpsde_edge_cond"
    config.data.spectra_version = "allspectra"
    # original-QM9 split (no conditional 4-way split)
    config.data.info_name = "qm9_with_h"
    return config
