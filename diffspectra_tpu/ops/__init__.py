from .kabsch import kabsch_batch, get_align_position, get_align_noise  # noqa: F401
