from . import masks, scalers, registry  # noqa: F401
