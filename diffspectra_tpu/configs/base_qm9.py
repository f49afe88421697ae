"""Auxiliary original-QM9 config (ref configs/base_qm9.py:7-121), passed as
``--config_original_qm9``. The reference uses it only to load train/test
rdmols for the metric reference sets (ref run_lib.py:340-342); here the same
role is served against the packed dataset store."""

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
