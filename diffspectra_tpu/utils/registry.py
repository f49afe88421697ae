"""Model registry (ref: models/utils.py:1-28).

The reference wraps every model in ``torch.nn.DataParallel`` here; the TPU
equivalent is sharding, which lives in ``diffspectra_tpu.parallel`` — model
construction stays pure.
"""

_MODELS = {}


def register_model(cls=None, *, name=None):
    def _register(cls):
        local_name = cls.__name__ if name is None else name
        if local_name in _MODELS:
            raise ValueError(f"Model {local_name!r} already registered")
        _MODELS[local_name] = cls
        return cls

    if cls is None:
        return _register
    return _register(cls)


def get_model_cls(name: str):
    if name not in _MODELS:
        raise ValueError(f"Unknown model {name!r}; registered: {sorted(_MODELS)}")
    return _MODELS[name]


def create_model(config):
    """Instantiate the flax module for ``config.model.name``."""
    return get_model_cls(config.model.name).from_config(config)
