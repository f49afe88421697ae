from . import losses, optim, train_state  # noqa: F401
