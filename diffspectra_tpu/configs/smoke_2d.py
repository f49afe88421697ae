"""Tiny 2D-only smoke config (only_2D pipeline: atoms + bonds, no
positions; ref config surface ``config.only_2D``)."""

try:
    from . import smoke
except ImportError:  # loaded standalone by ml_collections config_flags
    from diffspectra_tpu.configs import smoke


def get_config():
    config = smoke.get_config()
    config.only_2D = True
    config.model.name = "CDGS"
    config.model.pred_data = False  # CDGS is a noise-prediction model
    config.model.self_cond = False
    config.model.noise_align = False
    config.model.include_fc_charge = False  # CDGS predicts atom types only
    with config.unlocked():
        config.model.rw_depth = 4
    return config
